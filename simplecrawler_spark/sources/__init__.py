from .fixture_site import fixture_pages_rows, fixture_pages_df, PAGES_SCHEMA  # noqa: F401
