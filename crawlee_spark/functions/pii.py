"""PII scrubbing for training-data curation — engine-native extension.

Web-scale corpora must strip personal identifiers before training
(emails, phone numbers, IP addresses, payment-card numbers). This reuses
the reference's extraction patterns where they exist — the email and phone
grammars are the ones ported byte-for-byte from
``packages/utils/src/internals/social.ts`` (functions/social.py) — and
adds IPv4 + card-number patterns.

Everything is a pure ``regexp_replace`` Column chain (JVM-side, no Python
per row). Replacement ORDER is load-bearing:

1. emails first — an address's digits must not be eaten as a phone/card;
2. IPv4 next — dotted quads would otherwise match the phone grammar's
   dot-separated alternatives;
3. card numbers (13-16 digits with optional space/dash separators) before
   phones — a spaced card number matches the phone grammar's
   space-separated alternative;
4. phones last (the reference grammar is deliberately high-recall:
   any 6-15 digit run matches, social.ts:62-117 — right bias for a
   scrubber).

The replacement tokens contain no digits or ``@``, so later passes can
never re-match earlier replacements.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawlee_spark.functions.social import EMAIL_REGEX, PHONE_REGEX

IPV4_REGEX = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\b"
)
# 13-16 digits total, optional single space/dash between digits
CARD_REGEX = r"\b[0-9](?:[ -]?[0-9]){12,15}\b"

EMAIL_TOKEN = "[EMAIL]"
IP_TOKEN = "[IP]"
CARD_TOKEN = "[CC]"
PHONE_TOKEN = "[PHONE]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii_col(
    text: Column | str,
    *,
    email_token: str = EMAIL_TOKEN,
    ip_token: str = IP_TOKEN,
    card_token: str = CARD_TOKEN,
    phone_token: str = PHONE_TOKEN,
) -> Column:
    """Text with emails/IPv4s/card numbers/phones replaced by tokens, in
    the documented pass order."""
    c = F.regexp_replace(_c(text), EMAIL_REGEX, email_token)
    c = F.regexp_replace(c, IPV4_REGEX, ip_token)
    c = F.regexp_replace(c, CARD_REGEX, card_token)
    return F.regexp_replace(c, PHONE_REGEX, phone_token)


def pii_count_cols(text: Column | str) -> dict[str, Column]:
    """Per-type match counts, evaluated STAGE-WISE on the progressively
    redacted text (exactly what each redaction pass sees — counting every
    pattern against the raw text would double-count: a spaced card number
    is also a phone-grammar match)."""

    def n(c: Column, pattern: str) -> Column:
        return F.coalesce(
            F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))), F.lit(0)
        ).cast("long")

    c0 = _c(text)
    c1 = F.regexp_replace(c0, EMAIL_REGEX, EMAIL_TOKEN)
    c2 = F.regexp_replace(c1, IPV4_REGEX, IP_TOKEN)
    c3 = F.regexp_replace(c2, CARD_REGEX, CARD_TOKEN)
    return {
        "n_emails": n(c0, EMAIL_REGEX),
        "n_ips": n(c1, IPV4_REGEX),
        "n_cards": n(c2, CARD_REGEX),
        "n_phones": n(c3, PHONE_REGEX),
    }
