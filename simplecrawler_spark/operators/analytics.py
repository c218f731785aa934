"""Queue analytics over the frontier (the relational core, SURVEY.md §2.5).

Parity targets (/root/reference/src/queue.ts):
- max/min/avg       ⇔ queue.ts:192-247 (Q6-Q8): over *fetched* items only,
  whitelisted statistic names, missing values skipped, empty min ⇒ 0
- count_items       ⇔ queue.ts:249-257 (Q9)
- filter_items      ⇔ queue.ts:259-262 (Q10): conjunctive deep-match
  comparator incl. nested stateData fields
- get_length        ⇔ queue.ts:264-266 (Q11)
- oldest_unfetched  ⇔ queue.ts:176-189 (Q5): FIFO head

All are single-aggregation DataFrame plans: Catalyst pushes the ``fetched``
filter into the scan and the state-struct field access prunes columns, so at
10^10-row scale these are one pass over the needed columns only.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, Row, functions as F

# queue.ts:103-107 whitelist → frontier state column names
ALLOWED_STATISTICS = {
    "actualDataSize": "actual_data_size",
    "contentLength": "content_length",
    "downloadTime": "download_time",
    "requestLatency": "request_latency",
    "requestTime": "request_time",
}

# camelCase comparator keys (reference API) → frontier columns
_TOP_LEVEL = {"id": "id", "url": "url", "protocol": "protocol", "host": "host",
              "port": "port", "path": "path", "uriPath": "uri_path",
              "depth": "depth", "referrer": "referrer", "fetched": "fetched",
              "status": "status"}
_STATE_LEVEL = {"requestLatency": "request_latency", "requestTime": "request_time",
                "downloadTime": "download_time", "contentLength": "content_length",
                "contentType": "content_type", "code": "code",
                "actualDataSize": "actual_data_size",
                "sentIncorrectSize": "sent_incorrect_size"}


class InvalidStatisticError(ValueError):
    def __init__(self) -> None:
        super().__init__("Invalid statistic")


def _stat_col(statistic: str):
    if statistic not in ALLOWED_STATISTICS:
        raise InvalidStatisticError()
    return F.col("state." + ALLOWED_STATISTICS[statistic])


def _comparator_filter(df: DataFrame, comparator: Dict) -> DataFrame:
    """Recursive deep-match → conjunctive column equality (queue.ts:16-34)."""
    for key, value in comparator.items():
        if key == "stateData" and isinstance(value, dict):
            for sk, sv in value.items():
                if sk not in _STATE_LEVEL:
                    raise KeyError(f"unknown stateData field: {sk}")
                df = df.filter(F.col("state." + _STATE_LEVEL[sk]) == F.lit(sv))
        elif key in _TOP_LEVEL:
            df = df.filter(F.col(_TOP_LEVEL[key]) == F.lit(value))
        else:
            raise KeyError(f"unknown queue item field: {key}")
    return df


class QueueAnalytics:
    """Monitoring/statistics API over a frontier DataFrame."""

    def __init__(self, frontier: DataFrame) -> None:
        self.frontier = frontier

    def max(self, statistic: str) -> float:
        v = self.frontier.filter("fetched") \
            .agg(F.max(_stat_col(statistic))).collect()[0][0]
        return 0 if v is None else v

    def min(self, statistic: str) -> float:
        # Infinity sentinel ⇒ 0 on empty (queue.ts:226)
        v = self.frontier.filter("fetched") \
            .agg(F.min(_stat_col(statistic))).collect()[0][0]
        return 0 if v is None else v

    def avg(self, statistic: str) -> float:
        # sum/count over finite values of fetched items (queue.ts:229-247)
        v = self.frontier.filter("fetched") \
            .agg(F.avg(_stat_col(statistic))).collect()[0][0]
        return 0 if v is None else v

    def count_items(self, comparator: Dict) -> int:
        return _comparator_filter(self.frontier, comparator).count()

    def filter_items(self, comparator: Dict) -> List[Row]:
        return _comparator_filter(self.frontier, comparator) \
            .orderBy("id").collect()

    def get_length(self) -> int:
        return self.frontier.count()

    def oldest_unfetched_item(self) -> Optional[Row]:
        rows = self.frontier.filter(F.col("status") == "queued") \
            .orderBy("id").limit(1).collect()
        return rows[0] if rows else None

    def get(self, index: int) -> Row:
        """Q3 ⇔ queue.ts:145-155: index lookup with range error."""
        rows = self.frontier.filter(F.col("id") == index).limit(1).collect()
        if not rows:
            raise IndexError(f"out of range: {index}")
        return rows[0]

    def update(self, id_: int, updates: Dict) -> DataFrame:
        """Q4 ⇔ queue.ts:157-174 deepAssign: returns a NEW frontier with the
        row merged. Top-level keys overwrite; ``stateData`` merges field-wise
        into the nested state struct (withField ⇒ no shuffle, one projection
        — the Iceberg MERGE analog at snapshot-commit granularity)."""
        hit = F.col("id") == id_
        df = self.frontier
        matched = df.filter(hit).limit(1).count()
        if not matched:
            raise IndexError(f"no queue item with id: {id_}")
        for key, value in updates.items():
            if key == "stateData" and isinstance(value, dict):
                # deepAssign materializes nested objects: null state becomes
                # an all-null struct before the field merge
                stype = df.schema["state"].dataType
                state = F.coalesce(
                    F.col("state"),
                    F.struct(*[F.lit(None).cast(f.dataType).alias(f.name)
                               for f in stype.fields]))
                for sk, sv in value.items():
                    if sk not in _STATE_LEVEL:
                        raise KeyError(f"unknown stateData field: {sk}")
                    state = state.withField(_STATE_LEVEL[sk], F.lit(sv))
                df = df.withColumn("state", F.when(hit, state)
                                   .otherwise(F.col("state")))
            elif key in _TOP_LEVEL and key != "id":
                col = _TOP_LEVEL[key]
                df = df.withColumn(col, F.when(hit, F.lit(value))
                                   .otherwise(F.col(col)))
            else:
                raise KeyError(f"unknown queue item field: {key}")
        return df
