"""spark-submit CLI for the training-data prep DAG (plans.corpus_prep):

    spark-submit --py-files pkg.zip scripts/prep_corpus_job.py \
        --documents /path/documents.parquet --out /path/prep_out \
        --vocab-size 65536 --max-len 512 --n-shards 16

Prints ONE JSON metrics line (docs in/kept, tokens out/trimmed, examples)
— the tokens-tier counterpart of scripts/run_job.py.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--documents", required=True, help="documents parquet (doc_id, text, source)")
    p.add_argument("--out", required=True, help="output root (shards/ metrics_run/)")
    p.add_argument("--vocab-size", type=int, default=65536)
    p.add_argument("--max-len", type=int, default=512)
    p.add_argument("--n-shards", type=int, default=16)
    p.add_argument("--trim-window", type=int, default=32)
    p.add_argument("--trim-stride", type=int, default=16)
    p.add_argument("--min-words", type=int, default=5)
    p.add_argument("--max-words", type=int, default=5000)
    p.add_argument("--master", default=None, help="override master (else spark-submit decides)")
    p.add_argument(
        "--resume",
        action="store_true",
        help="reuse stages whose _SPEC.json marker matches the current "
        "parameters (stage-level restartability; changed stages recompute)",
    )
    args = p.parse_args(argv)

    from otel_tail_sampler_spark.plans.corpus_prep import run_corpus_prep
    from otel_tail_sampler_spark.session import build_session

    spark = build_session(app_name="corpus-prep", master=args.master)
    metrics = run_corpus_prep(
        spark,
        args.documents,
        args.out,
        vocab_size=args.vocab_size,
        max_len=args.max_len,
        n_shards=args.n_shards,
        trim_window=args.trim_window,
        trim_stride=args.trim_stride,
        min_words=args.min_words,
        max_words=args.max_words,
        resume=args.resume,
    )
    metrics["status"] = "ok"
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    sys.path.insert(0, ".")  # --py-files ships the package; repo runs work too
    main()
