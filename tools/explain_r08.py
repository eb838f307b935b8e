"""Capture .explain('formatted') for the headline queries into
plans/r08/<query>_{before,after}.txt.

'before' plans are produced by running the round-start tree (pass
--label before from a worktree checked out at the round-start commit);
'after' plans from the current tree (--label after).

Usage: python tools/explain_r08.py --label after [--out plans/r08] [query ...]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from bertseyeview_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "ngram_jaccard_dedup", "minhash_lsh_dedup", "quality_features",
    "language_id", "embedding_topk_cosine", "label_abundance_two_groups",
    "top_entities", "sessionization", "events_windowed_agg",
    "dictionary_mention_topk", "top_articles_citations",
    "connected_components",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", required=True, choices=["before", "after"])
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--out", default=None)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    out_dir = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r08",
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("explain_r08")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    # the dedup pair queries materialize eagerly (localCheckpoint) in
    # their public form — capture the LAZY operator plan instead, which
    # is the plan the checkpoint job executes
    def _lazy_ngram(spark, sf_dir):
        from bertseyeview_spark.operators import dedup as D

        return D.ngram_jaccard_pairs(
            E._t(spark, sf_dir, "documents"), "doc_id", "text",
            n=3, threshold=0.5, max_shingle_freq=None, materialize=False,
        )

    def _lazy_minhash(spark, sf_dir):
        from bertseyeview_spark.operators import dedup as D

        return D.minhash_lsh_pairs(
            E._t(spark, sf_dir, "documents"), "doc_id", "text",
            n=3, num_perm=32, bands=8, threshold=0.8, materialize=False,
        )

    lazy = {
        "ngram_jaccard_dedup": _lazy_ngram,
        "minhash_lsh_dedup": _lazy_minhash,
    }
    for name in args.queries or HEADLINE:
        try:
            df = lazy.get(name, qs[name])(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{args.label}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: {ex}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
