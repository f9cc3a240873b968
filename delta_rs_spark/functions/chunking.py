"""Document chunking via a Python UDTF (SURVEY §2B UDF/UDTF plane).

Fixed-size overlapping character windows — the retrieval/embedding prep
step that turns documents into chunk rows. Implemented as a Spark UDTF
because 1->N generative transforms are exactly what the UDTF API is for
(and it completes the UDF-plane coverage: pandas_udf, applyInPandas,
applyInPandasWithState, mapInPandas, and now UDTF).

Note on the hot path: a Python UDTF runs row-at-a-time Python. For a
100 TB corpus the same chunk math compiles to JVM expressions
(``chunk_spans`` below) — the UDTF is the API-parity surface and the
convenient form; the expression form is the scale path. Both produce
identical chunks, and the oracle checks the UDTF output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_no: int, start: int, chunk: string")
class ChunkText:
    """Yield (chunk_no, 1-based start, substring) windows of ``size``
    chars with ``stride`` steps; the final partial window is kept iff it
    adds new text. Deterministic: pure function of the input string."""

    SIZE = 200
    STRIDE = 150

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        import math

        if text is None:
            return
        n = len(text)
        n_windows = max(math.ceil((n - self.SIZE) / self.STRIDE) + 1, 1)
        for i in range(n_windows):
            start = i * self.STRIDE
            yield i, start + 1, text[start : start + self.SIZE]


def chunk_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """UDTF-driven chunking: one output row per (doc, window)."""
    df.createOrReplaceTempView("__chunk_src")
    spark = df.sparkSession
    spark.udtf.register("chunk_text", ChunkText)
    return spark.sql(
        f"""
        SELECT s.`{id_col}` AS doc_id, c.chunk_no, c.start, c.chunk
        FROM __chunk_src s, LATERAL chunk_text(s.`{text_col}`) c
        """
    )


def chunk_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """JVM-expression twin of ChunkText for the 100 TB path: same
    windows, no Python worker."""
    n = F.length(text_col)
    n_windows = F.greatest(
        F.ceil((n - (size - stride)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    spans = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__t"),
        F.explode(F.sequence(F.lit(0), n_windows - 1)).alias("chunk_no"),
    )
    start = F.col("chunk_no") * stride + 1
    return spans.select(
        "doc_id",
        "chunk_no",
        start.cast("int").alias("start"),
        F.col("__t").substr(start, F.lit(size)).alias("chunk"),
    )
