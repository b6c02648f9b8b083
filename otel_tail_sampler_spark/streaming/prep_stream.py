"""Streaming corpus-prep leg: continuously-ingesting documents -> gated,
deduplicated, tokenized parquet — the tokens-tier streaming counterpart of
streaming/stream_job.py's span pipeline.

    readStream(documents dir)                 (file source; Kafka swaps in)
      -> stateless quality gate               (word-count bounds + dup-word
                                               ratio: per-row expressions,
                                               legal in a streaming plan)
      -> hash tokenize                        (pure projection)
      -> cross-batch first-wins exact dedup   (applyInPandasWithState keyed
                                               by content digest; state =
                                               ONE tiny first_id row per
                                               distinct digest, tokens ride
                                               the emitted row only)
      -> parquet append sink                  (checkpointed file sink:
                                               exactly-once manifest commit,
                                               restart resumes from the
                                               checkpoint — the streaming-
                                               native resume analog of
                                               run_corpus_prep's _SPEC.json
                                               stage markers)

The batch DAG (plans/corpus_prep.py) remains the packing/sharding path —
packing needs global offsets, which is a bounded-job computation by
construction; this leg keeps the TOKENIZED table continuously current so
the bounded pack/shard job runs on demand over an always-fresh input.

Gate parity: the word-count and dup-word-ratio gates reuse the same
whitespace contract as the batch prepare_corpus (normalize -> trim ->
split); batch exact_dedup elects the MIN id per digest while this leg
elects the FIRST ARRIVAL (same-batch ties -> min id) — the defining
semantic difference of the streaming form, inherited from dedup_stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _quality_gate(
    docs: DataFrame,
    min_words: int,
    max_words: int,
    max_dup_word_frac: float,
    text_col: str = "text",
) -> DataFrame:
    """Stateless per-row quality gate (streaming-legal: no aggregation).
    Same signals as the batch prepare_corpus chain — word-count bounds and
    the duplicated-word fraction — as pure expressions."""
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    w = F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    n_words = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    dup_frac = F.when(
        n_words > 0,
        (n_words - n_distinct).cast("double") / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    return docs.filter(
        (n_words >= int(min_words))
        & (n_words <= int(max_words))
        & (dup_frac <= float(max_dup_word_frac))
    )


def tokenize_dedup_stream(
    docs: DataFrame,
    vocab_size: int = 65536,
    ttl_minutes: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenized, cross-batch-deduplicated document stream:
    -> (doc_id, source, tokens array<int>, n_tok int, dup_count int),
    one row per FIRST ARRIVAL of each content digest.

    Same state contract as dedup_stream (one ``first_id`` row per
    distinct digest, ``ttl_minutes`` arms the SETEX-style expiry), but
    the emitted row carries the tokenized payload so the sink lands the
    input_hint tokenized shape directly. Tokens never enter the state
    store — state stays O(distinct digests), not O(corpus bytes).
    """
    import pandas as pd

    from otel_tail_sampler_spark.operators.text import hash_tokenize

    with_digest = docs.withColumn("_digest", F.md5(F.col(text_col)))
    toks = hash_tokenize(
        with_digest,
        vocab_size=vocab_size,
        text_col=text_col,
        id_col=id_col,
        keep_cols=("source", "_digest"),
    )
    id_type = docs.schema[id_col].dataType.simpleString()
    keyed = toks.select(
        F.col("_digest"),
        F.col(id_col).alias("_id"),
        F.col("source").alias("_source"),
        F.col("tokens").alias("_tokens"),
        F.col("n_tok").alias("_n_tok"),
    )
    out_schema = (
        f"doc_id {id_type}, source string, tokens array<int>, "
        "n_tok int, dup_count int"
    )
    state_schema = f"first_id {id_type}"

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        rows: list[tuple] = []
        for pdf in pdfs:
            rows.extend(
                zip(pdf["_id"], pdf["_source"], pdf["_tokens"], pdf["_n_tok"])
            )
        emit = None
        if state.exists:
            pass  # later arrival of a known digest: drop
        elif rows:
            rows.sort(key=lambda r: r[0])  # same-batch ties -> min id
            first = rows[0]
            fid = first[0].item() if hasattr(first[0], "item") else first[0]
            state.update((fid,))
            emit = pd.DataFrame(
                [
                    {
                        "doc_id": fid,
                        "source": first[1],
                        "tokens": first[2],
                        "n_tok": int(first[3]),
                        "dup_count": len(rows) - 1,
                    }
                ]
            )
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if emit is not None:
            yield emit

    return keyed.groupBy("_digest").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            "ProcessingTimeTimeout" if ttl_minutes is not None else "NoTimeout"
        ),
    )


def run_prep_stream(
    spark: SparkSession,
    documents_dir: str,
    out_dir: str,
    vocab_size: int = 65536,
    min_words: int = 5,
    max_words: int = 5000,
    max_dup_word_frac: float = 0.6,
    ttl_minutes: int | None = None,
    available_now: bool = True,
):
    """Wire the streaming prep leg end-to-end over a documents directory
    and return the started StreamingQuery. Output lands under
    ``out_dir``/tokenized (append-only parquet, exactly-once via the file
    sink manifest); the checkpoint under ``out_dir``/_checkpoint makes a
    restart continue from the last committed batch — new source files
    only, no re-emission of already-committed digests.

    ``available_now=True`` drains everything currently in the directory
    and stops (the bounded test/run mode); ``False`` leaves the query
    running on the default micro-batch trigger.
    """
    schema = spark.read.parquet(documents_dir).schema
    docs = spark.readStream.schema(schema).parquet(documents_dir)
    gated = _quality_gate(
        docs, min_words=min_words, max_words=max_words,
        max_dup_word_frac=max_dup_word_frac,
    )
    deduped = tokenize_dedup_stream(
        gated, vocab_size=vocab_size, ttl_minutes=ttl_minutes
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/tokenized")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
