"""Error-message formatting parity with ``Request.pushErrorMessage``.

Reference: packages/core/src/request.ts:375-405. When a handler throws, the
reference inspects the thrown VALUE (JS lets you throw anything) and extracts
the most useful string before appending it to ``request.errorMessages``:

- ``Error`` instance          -> ``omitStack ? error.message : error.stack``
                                 (V8 ``.stack`` *includes* the "Name: message"
                                 first line)
- ``null``                    -> ``'null'``
- object with a ``message``   -> that message
- object whose ``toString()`` is not ``'[object Object]'`` -> ``String(obj)``
- any other plain object      -> ``util.inspect(obj)`` (guarded; on failure
                                 ``'Unable to extract any message from the
                                 received object.'``)
- ``undefined``               -> ``'undefined'``
- everything else             -> ``String(value)``

Python analog, branch for branch: exceptions carry a traceback-backed stack
(first line ``Name: message``, like V8), ``None`` maps to ``'null'``, objects
exposing ``.message`` (attribute or dict key) yield it, objects with a custom
``__str__`` yield ``str(obj)``, plain containers fall through to ``repr``
(the ``util.inspect`` analog), the ``_UNDEFINED`` sentinel maps to
``'undefined'``, and primitives stringify the way JS ``String()`` does
(``True -> 'true'``, ``1.0 -> '1'``).

The engine's own error strings (engine.py ``_error`` column) are already
strings, for which this function is the identity — the parity surface is the
user-facing API for arbitrary raised values, exercised by
tests/test_errors.py golden vectors.
"""

from __future__ import annotations

import traceback
from typing import Any

_UNDEFINED = object()  # stands in for JS `undefined` (distinct from None/null)

_INSPECT_FAILURE = "Unable to extract any message from the received object."


def _js_string(value: Any) -> str:
    """JS ``String(value)`` conventions for primitives."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        if value != value:
            return "NaN"
        if value == float("inf"):
            return "Infinity"
        if value == float("-inf"):
            return "-Infinity"
        if value.is_integer() and abs(value) < 1e21:
            return str(int(value))
        return repr(value)
    return str(value)


def _exception_stack(error: BaseException) -> str:
    """V8-style ``.stack``: "Name: message" first line, then the frames."""
    head = f"{type(error).__name__}: {error}"
    tb = error.__traceback__
    if tb is None:
        return head
    frames = "".join(traceback.format_tb(tb)).rstrip("\n")
    return f"{head}\n{frames}" if frames else head


def format_error_message(error: Any = _UNDEFINED, *, omit_stack: bool = False) -> str:
    """The string ``pushErrorMessage`` would append for this thrown value
    (request.ts:390-405 type-inspection ladder, branch for branch)."""
    if error is _UNDEFINED:
        return "undefined"
    if error is None:
        return "null"
    if isinstance(error, BaseException):
        return str(error) if omit_stack else _exception_stack(error)
    if isinstance(error, dict):
        if "message" in error:
            return _js_string(error["message"])
        # plain dict: toString() would be '[object Object]' -> util.inspect
        try:
            return repr(error)
        except Exception:
            return _INSPECT_FAILURE
    if isinstance(error, (str, int, float, bool)):
        return _js_string(error)
    message = getattr(error, "message", _UNDEFINED)
    if message is not _UNDEFINED:
        return _js_string(message)
    if type(error).__str__ is not object.__str__:
        return str(error)  # custom toString-equivalent
    try:
        return repr(error)  # util.inspect analog
    except Exception:
        return _INSPECT_FAILURE


def push_error_message(
    error_messages: list[str] | None, error: Any = _UNDEFINED, *, omit_stack: bool = False
) -> list[str]:
    """``request.pushErrorMessage(error)``: append the formatted message,
    returning the new list (request rows are immutable frame rows here)."""
    return [*(error_messages or []), format_error_message(error, omit_stack=omit_stack)]


def error_snapshot_filename_col(error):
    """ErrorSnapshotter.generateFilename, branch for branch
    (packages/core/src/crawlers/error_snapshotter.ts:133-160):
    ``ERROR_SNAPSHOT_<sha1(stack||message)[:30]>_<message[:30].trim()>``
    with non-word runs collapsed to ``-`` and the whole name capped at 250
    chars. The engine's error strings serve as both stack and message (they
    are single formatted lines — request.ts pushErrorMessage output), so
    the hash input is the full message.

    Pure Column expression; pinned by hashlib/re golden vectors in
    tests/test_errors.py."""
    from pyspark.sql import functions as F

    e = F.col(error) if isinstance(error, str) else error
    stack_hash = F.substring(F.sha1(F.coalesce(e, F.lit(""))), 1, 30)
    msg_prefix = F.trim(
        F.substring(F.coalesce(e, F.lit("An error occurred")), 1, 30)
    )

    def sanitize(c):
        return F.regexp_replace(c, r"^\W+|\W+$", "")

    raw = F.concat(
        F.lit("ERROR_SNAPSHOT_"), sanitize(stack_hash), F.lit("_"), sanitize(msg_prefix)
    )
    return F.substring(F.regexp_replace(raw, r"\W+", "-"), 1, 250)
