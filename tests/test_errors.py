"""Golden vectors for pushErrorMessage formatting parity (request.ts:375-405).

Each case mirrors one branch of the reference's type-inspection ladder; the
expectations are the strings the reference would push for the analogous JS
value (no Spark session needed — pure function)."""

import pytest

from crawlee_spark.functions.errors import (
    _UNDEFINED,
    format_error_message,
    push_error_message,
)


def test_error_instance_includes_stack_with_message_first_line():
    # V8 .stack starts with "Name: message"; omitStack keeps just the message
    try:
        raise ValueError("boom")
    except ValueError as e:
        caught = e
    full = format_error_message(caught)
    assert full.splitlines()[0] == "ValueError: boom"
    assert len(full.splitlines()) > 1  # frames present
    assert format_error_message(caught, omit_stack=True) == "boom"


def test_error_without_traceback_is_just_name_message():
    assert format_error_message(RuntimeError("x")) == "RuntimeError: x"


def test_null_and_undefined():
    assert format_error_message(None) == "null"
    assert format_error_message() == "undefined"
    assert format_error_message(_UNDEFINED) == "undefined"


def test_object_with_message_property():
    assert format_error_message({"message": "from object"}) == "from object"

    class WithMessage:
        message = "attr message"

    assert format_error_message(WithMessage()) == "attr message"


def test_object_with_custom_tostring():
    class Stringy:
        def __str__(self):
            return "I stringify myself"

    assert format_error_message(Stringy()) == "I stringify myself"


def test_plain_object_falls_back_to_inspect():
    # JS: toString() === '[object Object]' -> util.inspect(obj)
    assert format_error_message({"code": 7}) == "{'code': 7}"


def test_inspect_failure_sentinel():
    class Hostile:
        __str__ = object.__str__

        def __repr__(self):
            raise RuntimeError("no repr")

    assert (
        format_error_message(Hostile())
        == "Unable to extract any message from the received object."
    )


@pytest.mark.parametrize(
    ("value", "expected"),
    [
        ("already a string", "already a string"),
        (True, "true"),
        (False, "false"),
        (3, "3"),
        (1.0, "1"),
        (1.5, "1.5"),
        (float("nan"), "NaN"),
        (float("inf"), "Infinity"),
    ],
)
def test_primitives_stringify_like_js(value, expected):
    assert format_error_message(value) == expected


def test_push_appends_and_preserves_existing():
    msgs = push_error_message(None, RuntimeError("first"))
    msgs = push_error_message(msgs, {"message": "second"})
    assert msgs == ["RuntimeError: first", "second"]


def test_error_snapshot_filename_golden(spark):
    """error_snapshot_filename_col mirrors ErrorSnapshotter.generateFilename
    (error_snapshotter.ts:133-160) — verified against a direct hashlib/re
    re-implementation of the reference algorithm."""
    import hashlib
    import re

    from pyspark.sql import functions as F

    from crawlee_spark.functions.errors import error_snapshot_filename_col

    def reference(message):
        stack_hash = hashlib.sha1((message or "").encode()).hexdigest()[:30]
        prefix = (message or "An error occurred")[:30].strip()
        san = lambda s: re.sub(r"^\W+|\W+$", "", s)  # noqa: E731
        name = f"ERROR_SNAPSHOT_{san(stack_hash)}_{san(prefix)}"
        return re.sub(r"\W+", "-", name)[:250]

    msgs = [
        "Request failed with status 503",
        "  ...weird leading punctuation!! and a very long message " + "x" * 300,
        "Antibot protection detected. Found selectors: #turnstile-wrapper",
        "TypeError: Cannot read properties of undefined (reading 'foo')",
        "short",
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "err string")
    got = [
        r["fn"]
        for r in df.select(error_snapshot_filename_col("err").alias("fn")).collect()
    ]
    assert got == [reference(m) for m in msgs]
