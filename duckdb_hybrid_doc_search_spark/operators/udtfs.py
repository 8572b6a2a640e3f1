"""Python UDTF surface (Spark 4): user-defined TABLE functions invoked
via LATERAL — the API a reference user reaches for when a per-row
expansion doesn't fit explode()'s one-expression shape.

Scale honesty: a Python UDTF is row-at-a-time Python in the task (Arrow
transfer of results can be enabled with
spark.sql.execution.pythonUDTF.arrow.enabled, but eval() itself stays
per-row). This module exists to cover the API — tests assert the UDTF
result equals the pure-SQL explode equivalent (test_udtf.py), which is
what the hot path should use; the oracle gates the UDTF output itself.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

SENT_SPLIT = r"[.!?]+"
_WS = " \t\n\r\f\v"


@udtf(returnType="sentence_no int, sentence string, n_chars int")
class SplitSentences:
    """Yield (1-based index, trimmed sentence, length) per input text;
    empty segments (e.g. trailing punctuation) are dropped BEFORE
    numbering, so sentence_no is dense."""

    def eval(self, text: str):
        if text is None:
            return
        pieces = [p.strip(_WS) for p in re.split(SENT_SPLIT, text)]
        no = 0
        for p in pieces:
            if p:
                no += 1
                yield no, p, len(p)


def sentence_split_udtf(docs: DataFrame) -> DataFrame:
    """Per-document sentence table via the UDTF, LATERAL-joined — each
    task streams its partition's documents through eval(); no shuffle
    before the final presentation sort."""
    spark = docs.sparkSession
    spark.udtf.register("split_sentences", SplitSentences)
    docs.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, s.sentence_no, s.sentence, s.n_chars
        FROM _udtf_docs, LATERAL split_sentences(text) s
        ORDER BY doc_id, sentence_no
        """
    )


def sentence_split_sql(docs: DataFrame) -> DataFrame:
    """The vectorized JVM-side equivalent (posexplode of the filtered
    split) — the form the hot path should use; tests pin it equal to the
    UDTF output."""
    # trim via regexp (leading/trailing whitespace incl. \f\v) to match
    # Python str.strip exactly
    ws_cls = r"[ \t\n\r\f\v]"
    trimmed = F.filter(
        F.transform(
            F.split(F.col("text"), SENT_SPLIT),
            lambda x: F.regexp_replace(
                F.regexp_replace(x, f"^{ws_cls}+", ""), f"{ws_cls}+$", ""
            ),
        ),
        lambda x: x != "",
    )
    ex = docs.select(
        "doc_id", F.posexplode(trimmed).alias("pos", "sentence")
    )
    return ex.select(
        "doc_id",
        (F.col("pos") + 1).cast("int").alias("sentence_no"),
        "sentence",
        F.length("sentence").cast("int").alias("n_chars"),
    ).orderBy("doc_id", "sentence_no")


def dd_sentence_split_sql(table: str = "documents") -> str:
    return rf"""
WITH s AS (
  SELECT doc_id,
         list_filter(
           list_transform(regexp_split_to_array(text, '{SENT_SPLIT}'),
                          x -> trim(x, ' ' || chr(9) || chr(10) || chr(13)
                                       || chr(12) || chr(11))),
           x -> x <> '') AS l
  FROM {table}
)
SELECT doc_id,
       unnest(range(1, len(l) + 1))::INT AS sentence_no,
       unnest(l) AS sentence,
       unnest(list_transform(l, x -> length(x)::INT)) AS n_chars
FROM s
ORDER BY doc_id, sentence_no
""".strip()
