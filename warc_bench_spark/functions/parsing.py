"""String/payload parsing scalars the reference applies per row (SURVEY.md
§2.3 C9/C13/C14/C15), re-expressed as JVM column expressions where possible
and Arrow-vectorized pandas UDFs where Python semantics are required.

* ``parse_call_args_udf`` — typed argument parsing of action-call strings
  via ``ast.literal_eval`` (mirrors
  ``/root/reference/src/orby/digitalagent/utils/action_parsing_utils.py:
  273-300``): ``click("a1", 3, 4.5)`` -> ["a1", 3, 4.5] as JSON.
* ``unicode_unescape_udf`` — ``codecs.decode(s, 'unicode_escape')``
  (``subtask_benchmark/evaluator/evaluator.py:118,167``); no Spark builtin.
* ``decode_payload_col`` — content-type-gated binary->string decode
  (``webreplay-standalone/src/libs/warc/http-parser.ts:3-24``): textual
  content types decode as UTF-8, everything else stays NULL.
* ``normalize_payload_col`` — fuzzy payload normalization before equality
  matching (``utils.ts:95-189`` matchPayload): volatile substitution of
  ``timestamp=<digits>``, JIRA externalToken, Salesforce aura ids.
"""

from __future__ import annotations

import ast
import codecs
import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

TEXTUAL_CONTENT_RE = r"json|xml|html|plain|javascript|x-www-form-urlencoded"


@pandas_udf(StringType())
def parse_call_args_udf(calls: pd.Series) -> pd.Series:
    """'name(arg1, arg2, ...)' -> JSON array of literal-eval'd args."""

    def parse(s: str | None) -> str | None:
        if not s:
            return None
        lp, rp = s.find("("), s.rfind(")")
        if lp < 0 or rp <= lp:
            return None
        try:
            args = ast.literal_eval("(" + s[lp + 1 : rp] + ",)")
        except (ValueError, SyntaxError):
            return None
        return json.dumps(list(args))

    return calls.map(parse)


@pandas_udf(StringType())
def unicode_unescape_udf(strings: pd.Series) -> pd.Series:
    def unescape(s: str | None) -> str | None:
        if s is None:
            return None
        try:
            return codecs.decode(s, "unicode_escape")
        except UnicodeDecodeError:
            return s

    return strings.map(unescape)


def decode_payload_col(payload: Column, content_type: Column) -> Column:
    """binary payload -> string iff the content type is textual (C14)."""
    return F.when(
        content_type.rlike(TEXTUAL_CONTENT_RE), payload.cast("string")
    ).otherwise(F.lit(None))


def normalize_payload_col(payload_str: Column) -> Column:
    """Volatile-token substitution so payloads become an equi-join key (C15)."""
    out = F.regexp_replace(payload_str, r"timestamp=\d+", "timestamp={timestamp}")
    out = F.regexp_replace(
        out, r'"externalToken"\s*:\s*"[^"]*"', '"externalToken":"{token}"'
    )
    out = F.regexp_replace(out, r'"aura\.token"\s*:\s*"[^"]*"', '"aura.token":"{token}"')
    return out
