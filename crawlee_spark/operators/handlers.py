"""Per-label user request handlers — the Router surface (C13 dispatch into
user code), set-oriented.

Reference semantics:

- ``requestHandler`` / ``Router`` (packages/core/src/router.ts:315-329,
  packages/basic-crawler/src/internals/basic-crawler.ts:159-175): every crawl
  supplies a handler; a Router dispatches on ``request.label`` with an
  optional default route. A label with neither its own route nor a default
  raises ``MissingRouteError`` — a ``CriticalError`` that ABORTS the crawl
  (basic-crawler.ts:1889), it is not a per-request retry.
- A handler THROW is retryable (basic-crawler.ts:1880-1941): the error is
  pushed to ``request.errorMessages`` and the request reclaims until
  ``maxRequestRetries``, then finalizes as failed.

Spark shape: the reference calls user code once per request inside the
event loop; here each handler is an Arrow-batched function over its label's
partition of the round's successes (columns in → extra result columns out).
Dispatch is a per-label filter + ``mapInPandas`` over a NARROW projection
(the handler I/O columns only — wide frontier payload never crosses into
Python), and the extra columns join back on ``request_id`` at claim scale.
The hot path stays vectorized: user ``fn`` runs once per Arrow batch; only
when a batch throws does the wrapper re-run it row-by-row to isolate the
poisoned request(s), so one bad request retries alone instead of failing
its whole batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The narrow context a handler sees — the DataFrame analog of the reference's
# CrawlingContext {request, response, parsed content} (router.ts:17-21).
# Only the subset present on the input frame is passed.
HANDLER_INPUT_COLS = (
    "request_id",
    "url",
    "loaded_url",
    "unique_key",
    "label",
    "user_data",
    "crawl_depth",
    "retry_count",
    "session_rotation_count",
    "status_code",
    "content_type",
    "extracted_text",
    "links",
    "error_messages",
    # proxyInfo surface (proxy_configuration.ts:80-115) when a proxy
    # policy is configured on the engine
    "proxy_tier",
    "proxy_url",
)

_ERR_COL = "_handler_error"

# Handler-emitted requests (context.addRequests, basic-crawler.ts:1651-1672;
# enqueueLinks({urls: [...]}) explicit-urls path, enqueue_links.ts:244-294):
# a handler may declare these output columns to ENQUEUE urls it computed
# itself (pagination, API listings) instead of — or in addition to — the
# automatic E1 link extraction. The engine consumes them (they never reach
# the results dataset): emitted urls flow into the same gate → dedup →
# enqueue stage as extracted links, with `enqueue_label`/`enqueue_user_data`
# stamped per emitting row onto every url it emitted (the analog of the
# reference's per-call `enqueueLinks({urls, label, userData})`).
ENQUEUE_URLS_COL = "enqueue_urls"
ENQUEUE_LABEL_COL = "enqueue_label"
ENQUEUE_USER_DATA_COL = "enqueue_user_data"
ENQUEUE_OUTPUT_TYPES: dict[str, T.DataType] = {
    ENQUEUE_URLS_COL: T.ArrayType(T.StringType()),
    ENQUEUE_LABEL_COL: T.StringType(),
    ENQUEUE_USER_DATA_COL: T.StringType(),
}


class MissingRouteError(ValueError):
    """router.ts:324-329 — a CriticalError in the reference: aborts the run."""


@dataclass(frozen=True)
class RequestHandler:
    """One route: an Arrow-batched user function plus the schema of the EXTRA
    result columns it produces.

    ``fn(pdf) -> pd.DataFrame`` receives a pandas batch of handler-input
    columns and returns a same-length frame containing (a subset of) the
    ``output_schema`` columns; missing declared columns are null-filled.
    Raising marks the batch's requests as handler errors (retryable),
    row-isolated on the fallback pass."""

    fn: Callable[[pd.DataFrame], pd.DataFrame]
    output_schema: T.StructType = T.StructType([])


def _format_handler_error(exc: BaseException) -> str:
    from crawlee_spark.functions.errors import format_error_message

    return format_error_message(exc)


def _wrap(fn: Callable, extra_fields: list[T.StructField]):
    """mapInPandas generator: vectorized call per batch; on a raise, re-run
    row-by-row so only the throwing rows carry ``_handler_error``."""
    extra_names = [f.name for f in extra_fields]

    def _extras_frame(pdf: pd.DataFrame, result) -> pd.DataFrame:
        n = len(pdf)
        if result is None:
            result = pd.DataFrame(index=range(n))
        if len(result) != n:
            raise ValueError(
                f"handler returned {len(result)} rows for a {n}-row batch"
            )
        out = pd.DataFrame(index=range(n))
        result = result.reset_index(drop=True)
        for c in extra_names:
            out[c] = result[c] if c in result.columns else None
        return out

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            try:
                extras = _extras_frame(pdf, fn(pdf.copy()))
                errs = pd.Series([None] * len(pdf), dtype=object)
            except Exception:
                rows, errs_l = [], []
                for i in range(len(pdf)):
                    row = pdf.iloc[[i]].reset_index(drop=True)
                    try:
                        rows.append(_extras_frame(row, fn(row.copy())))
                        errs_l.append(None)
                    except Exception as exc:  # this request alone retries
                        rows.append(
                            pd.DataFrame({c: [None] for c in extra_names})
                            if extra_names
                            else pd.DataFrame(index=[0])
                        )
                        errs_l.append(_format_handler_error(exc))
                extras = (
                    pd.concat(rows, ignore_index=True)
                    if rows
                    else pd.DataFrame(index=range(0))
                )
                errs = pd.Series(errs_l, dtype=object)
            out = pd.DataFrame({"request_id": pdf["request_id"].values})
            out[_ERR_COL] = errs.values
            for c in extra_names:
                out[c] = extras[c].values
            yield out

    return gen


def _reserved_output_cols() -> frozenset:
    from crawlee_spark.operators.frontier import FRONTIER_SCHEMA

    return (
        frozenset(HANDLER_INPUT_COLS)
        | frozenset(f.name for f in FRONTIER_SCHEMA.fields)
        | {_ERR_COL, "_eh", "_outcome", "_error", "_links", "_blocked_sel"}
        # results-dataset columns the round's final select emits directly
        # (engine results append): a handler shadowing one of these would
        # produce a duplicate column in the parquet write mid-crawl
        | {"round_id", "text", "loaded_url"}
    )


def merged_extra_fields(handlers: dict) -> list[T.StructField]:
    """Union of every route's extra-column schema (results-dataset columns).
    A name declared by two routes must agree on type; names that collide
    with engine/frontier columns are rejected UP FRONT — a duplicate
    'label' or 'url' column would otherwise surface mid-crawl as an
    AMBIGUOUS_REFERENCE after the extras join."""
    reserved = _reserved_output_cols()
    merged: dict[str, T.StructField] = {}
    for h in handlers.values():
        for fld in h.output_schema.fields:
            if fld.name in reserved:
                raise ValueError(
                    f"handler output column '{fld.name}' collides with an "
                    "engine column; pick a different name (mutating request "
                    "fields is the errorHandler's job, not a result column)"
                )
            expected = ENQUEUE_OUTPUT_TYPES.get(fld.name)
            if expected is not None and fld.dataType != expected:
                raise ValueError(
                    f"handler output column '{fld.name}' is engine-consumed "
                    f"and must be {expected.simpleString()}, got "
                    f"{fld.dataType.simpleString()}"
                )
            if fld.name in (ENQUEUE_LABEL_COL, ENQUEUE_USER_DATA_COL) and not any(
                g.name == ENQUEUE_URLS_COL
                for hh in handlers.values()
                for g in hh.output_schema.fields
            ):
                raise ValueError(
                    f"'{fld.name}' declared but no route declares "
                    f"'{ENQUEUE_URLS_COL}' — nothing would be enqueued"
                )
            prev = merged.get(fld.name)
            if prev is not None and prev.dataType != fld.dataType:
                raise ValueError(
                    f"handler output column '{fld.name}' declared with "
                    f"conflicting types {prev.dataType} vs {fld.dataType}"
                )
            merged[fld.name] = T.StructField(fld.name, fld.dataType, True)
    return list(merged.values())


# request fields the reference's errorHandler may mutate in place
# (basic-crawler.ts:1896-1906: the handler runs before the noRetry re-check
# and the retryCount increment, so flipping no_retry converts the retry into
# a finalized failure)
ERROR_MUTABLE_COLS = (
    ("user_data", T.StringType()),
    ("no_retry", T.BooleanType()),
    ("max_retries", T.IntegerType()),
    ("forefront", T.BooleanType()),
    ("label", T.StringType()),
)


def apply_error_handler(df: DataFrame, fn: Callable) -> DataFrame:
    """errorHandler (basic-crawler.ts:1896-1899), set-wise: ``df`` holds the
    round's would-retry requests (handler-input columns + the mutable request
    fields + ``error_message``); ``fn(pdf)`` returns the batch with any
    mutations applied. Output: ``(request_id, _eh, *mutable)`` — ``_eh``
    marks rows the handler saw, so the caller can distinguish "no mutation"
    from a genuine NULL assignment. A throw from the handler itself
    propagates (the reference rethrows user-hook errors,
    basic-crawler.ts:1944-1951)."""
    mutable = [(c, t) for c, t in ERROR_MUTABLE_COLS if c in df.columns]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            result = fn(pdf.copy())
            if result is None:
                result = pdf
            if len(result) != len(pdf):
                raise ValueError(
                    f"error_handler returned {len(result)} rows for a "
                    f"{len(pdf)}-row batch"
                )
            result = result.reset_index(drop=True)
            out = pd.DataFrame({"request_id": pdf["request_id"].values})
            out["_eh"] = True
            for c, _ in mutable:
                out[c] = (result[c] if c in result.columns else pdf[c]).values
            yield out

    schema = T.StructType(
        [
            T.StructField("request_id", T.StringType(), False),
            T.StructField("_eh", T.BooleanType(), False),
            *[T.StructField(c, t, True) for c, t in mutable],
        ]
    )
    return df.mapInPandas(gen, schema=schema)


def apply_request_handlers(
    df: DataFrame, handlers: dict[str | None, RequestHandler]
) -> DataFrame:
    """Dispatch ``df`` (one row per successful request) to its label's
    handler and return ``(request_id, _handler_error, *extra columns)`` —
    one row per input row.

    ``handlers`` maps label → RequestHandler; the ``None`` key is the
    default route (router.addDefaultHandler). A row whose label has no route
    and no default raises ``MissingRouteError`` (CriticalError semantics:
    the reference aborts the crawl, router.ts:324).

    One ``mapInPandas`` branch per route — no shuffle: each branch is a
    filter over the same narrow projection, and the branches union."""
    if not handlers:
        raise ValueError("apply_request_handlers called with no handlers")
    extra_fields = merged_extra_fields(handlers)
    in_cols = [c for c in HANDLER_INPUT_COLS if c in df.columns]
    if "request_id" not in in_cols:
        raise ValueError("handler input frame must carry request_id")
    narrow = df.select(*in_cols)

    routed = [l for l in handlers if l is not None]
    has_default = None in handlers
    if not has_default:
        # MissingRouteError is a CriticalError: abort, don't retry. One tiny
        # aggregate over the distinct labels decides (labels are app-bounded)
        unrouted = (
            (F.col("label").isNull() | ~F.col("label").isin(routed))
            if routed
            else F.lit(True)
        )
        bad = (
            narrow.select("label").filter(unrouted).groupBy("label").count().limit(1).collect()
        )
        if bad:
            lbl = bad[0]["label"]
            raise MissingRouteError(
                f"Route not found for label '{lbl}'."
                " You must set up a route for this label or a default route."
                " Use `requestHandler`, `router.addHandler` or"
                " `router.addDefaultHandler`."
            )

    out_schema = T.StructType(
        [
            T.StructField("request_id", T.StringType(), False),
            T.StructField(_ERR_COL, T.StringType(), True),
            *extra_fields,
        ]
    )
    branches = []
    for label, h in handlers.items():
        if label is None:
            part = narrow.filter(
                (~F.col("label").isin(routed)) | F.col("label").isNull()
                if routed
                else F.lit(True)
            )
        else:
            part = narrow.filter(F.col("label") == label)
        branches.append(part.mapInPandas(_wrap(h.fn, extra_fields), schema=out_schema))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
