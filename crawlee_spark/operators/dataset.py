"""Dataset (results store), exports, and the label Router.

Reference semantics:

- ``Dataset.pushData`` — append-only, push-ordered result log with payload
  chunking at 9 MB (packages/core/src/storages/dataset.ts:276-301, limit at
  dataset.ts:60). Spark: an append-only parquet/Iceberg table; chunking
  disappears (columnar pages), ordering survives as an explicit
  ``push_seq`` column.
- ``Dataset.exportTo{JSON,CSV}`` / ``crawler.exportData`` — dump the dataset
  to one file (packages/basic-crawler/src/internals/basic-crawler.ts:
  1355-1404). Spark: ``df.write.json/csv``; ``single_file=True`` coalesces
  to 1 partition to match the reference's one-file contract (only sane for
  small exports — the default keeps one file per partition).
- ``Dataset.getData`` offset/limit pagination (dataset.ts:276 area,
  packages/core/src/storages/dataset.ts getData): ``push_seq`` range filter.
- ``Router`` — label-based dispatch of requests to handlers
  (packages/core/src/router.ts): ``userData.label`` picks the handler,
  missing label falls to the default handler, unknown label throws. Spark:
  per-label transformations applied to label-filtered slices, unioned.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class Dataset:
    """Append-only result log backed by a parquet directory."""

    spark: SparkSession
    root: str

    def _meta_path(self) -> str:
        return self.root.rstrip("/") + ".meta.json"

    def _next_seq(self) -> int:
        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                return int(json.load(f)["next_seq"])
        return 0

    def _advance_seq(self, next_seq: int) -> None:
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"next_seq": next_seq}, f)
        os.replace(tmp, self._meta_path())

    def push_data(self, df: DataFrame, order_from: str | None = None) -> None:
        """S7 pushData: append rows; push order recorded in ``push_seq`` =
        a driver-maintained base counter + the in-batch rank, so the sequence
        is contiguous across pushes and identical across re-runs (the
        frontier's order_seq discipline — never monotonically_increasing_id,
        which is partition-layout-dependent). In-batch rank comes from
        ``order_from`` when the caller has an arrival order, else from a
        stable row digest (deterministic, arbitrary-but-repeatable order).
        The rank window is a single pass over one push batch (result-log
        sized, not frontier sized)."""
        base = self._next_seq()
        order = (
            F.col(order_from)
            if order_from
            else F.md5(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
        )
        out = df.withColumn(
            "push_seq", (F.lit(base) + F.row_number().over(Window.orderBy(order))).cast("long")
        )
        out = out.localCheckpoint(eager=True)  # pin before the count+write pair
        n = out.count()
        out.write.mode("append").parquet(self.root)
        self._advance_seq(base + n)

    def read(self) -> DataFrame:
        if not os.path.exists(self.root):
            raise FileNotFoundError(f"dataset not initialized: {self.root}")
        return self.spark.read.parquet(self.root)

    def get_data(self, *, offset: int = 0, limit: int | None = None) -> DataFrame:
        """Offset/limit pagination in push order (dataset.ts getData)."""
        out = self.read().orderBy("push_seq").offset(offset)
        return out.limit(limit) if limit is not None else out

    def get_info(self) -> dict:
        """``Dataset.getInfo`` (dataset.ts:458-470): O(1) metadata from the
        driver-maintained sequence counter — no table scan."""
        return {"itemCount": self._next_seq()}

    def iterate(self, *, offset: int = 0, limit: int | None = None):
        """``Dataset.forEach`` iteration surface (dataset.ts:484-512): yield
        rows in push order WITHOUT materializing the dataset on the driver —
        ``toLocalIterator`` streams one partition at a time. The reference's
        sequential iteratee contract maps to ``for row in ds.iterate()``."""
        return self.get_data(offset=offset, limit=limit).toLocalIterator()

    def map_items(self, fn: Callable[[DataFrame], DataFrame]) -> DataFrame:
        """``Dataset.map`` (dataset.ts:514-542), Spark-first: apply a
        set-wise transformation to the push-ordered frame and return the
        transformed FRAME (the reference materializes a driver array —
        ``.collect()`` at the call site reproduces that for small results,
        but the transform itself stays distributed)."""
        return fn(self.read().orderBy("push_seq"))

    def reduce_items(self, fn: Callable, memo=None, *, offset: int = 0):
        """``Dataset.reduce`` (dataset.ts:544-607): an arbitrary SEQUENTIAL
        fold — inherently order-dependent, so it runs as a driver fold over
        the streamed push-order iterator (exactly the reference's contract).
        For associative/commutative reductions use ``read().agg(...)``
        instead: that form parallelizes with map-side partial aggregation
        and is the right shape at scale; this method is the compatibility
        surface for folds that genuinely need push order."""
        it = self.iterate(offset=offset)
        acc = memo
        first = memo is None
        for row in it:
            if first:
                acc, first = row, False
            else:
                acc = fn(acc, row)
        return acc

    def drop(self) -> None:
        """``Dataset.drop`` (dataset.ts:685-689): remove data + metadata."""
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)
        if os.path.exists(self._meta_path()):
            os.remove(self._meta_path())

    def export_to(self, path: str, fmt: str = "json", single_file: bool = False) -> None:
        """S8 exportTo{JSON,CSV}."""
        df = self.read().orderBy("push_seq")
        if single_file:
            df = df.coalesce(1)
        writer = df.write.mode("overwrite")
        if fmt == "json":
            writer.json(path)
        elif fmt == "csv":
            writer.option("header", True).csv(path)
        else:
            raise ValueError(f"unsupported export format: {fmt}")


def route_by_label(
    df: DataFrame,
    handlers: dict[str, Callable[[DataFrame], DataFrame]],
    *,
    label_col: str = "label",
    default_handler: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """C13 Router: apply each label's handler to its slice and union.

    Rows whose label has no handler — INCLUDING null labels, the reference's
    "no userData.label" case — go to ``default_handler``; if none is given
    they raise — matching Router.addHandler/addDefaultHandler
    (packages/core/src/router.ts: missing label runs the default handler,
    missing route throws 'No route for label...'). The check is set-wise:
    one aggregation over distinct labels instead of a per-row throw.
    NB: ``~label.isin(...)`` alone is NULL-false for null labels, which
    would silently drop them from every branch — the isNull() arm is
    load-bearing."""
    label = F.col(label_col)
    known = [k for k in handlers]
    unrouted = df.filter(label.isNull() | ~label.isin(*known) if known else F.lit(True))
    if default_handler is None:
        bad = [r[0] for r in unrouted.select(label_col).distinct().limit(5).collect()]
        if bad:
            raise ValueError(f"no route for labels: {bad}")
    parts = []
    for key, fn in handlers.items():
        parts.append(fn(df.filter(label == key)))
    if default_handler is not None:
        parts.append(default_handler(unrouted))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
