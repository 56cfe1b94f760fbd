"""Python UDTFs (Spark 4 table functions) — the gap-surface item from
SURVEY §2 ("UDF/UDAF/UDTF: none" in the reference).

``NgramsUDTF`` is a lateral-join table function emitting one row per word
n-gram; it demonstrates the UDTF contract (analyze-free fixed schema,
per-row fan-out). The production n-gram path stays in built-in functions
(operators.text / operators.dedup — JVM-side); a UDTF is the tool when
per-row expansion needs arbitrary Python (tokenizers, parsers).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, ngram: string")
class NgramsUDTF:
    """lateral NgramsUDTF(text, n) → (pos, ngram) rows."""

    def eval(self, text: str, n: int = 2):  # noqa: D102
        if not text:
            return
        words = text.split(" ")
        for i in range(max(len(words) - n + 1, 0)):
            yield i, " ".join(words[i : i + n])


def register_udtfs(spark) -> None:
    """Register the UDTF surface on a session (idempotent)."""
    spark.udtf.register("ngrams", NgramsUDTF)
