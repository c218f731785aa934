from .crawl import WaveCrawler  # noqa: F401
