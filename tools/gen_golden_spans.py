"""Regenerate the frozen span-fingerprint oracle for sf0.001.

    python tools/gen_golden_spans.py --write   # regenerate (explicit!)

The golden parquet (tests/golden/span_fp_sf0.001.parquet) freezes
doc_id -> md5(span sequence) over the driver's sf0.001 corpus.  The
pytest that consumes it re-derives the fingerprints through the full
Ray pipeline and compares — an oracle that survives refactors.  Only
regenerate after an INTENTIONAL extraction-semantics change, and say
so in the commit message.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
    "span_fp_sf0.001.parquet",
)
SF = "/root/testdata/sf0.001"


def main():
    if "--write" not in sys.argv:
        print(__doc__)
        sys.exit(2)
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from html_extract import pipeline as P

    fp = P.span_fingerprints(P.extracted_dataset(SF)).to_pandas()
    fp = fp.sort_values("doc_id", ignore_index=True)
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    fp.to_parquet(GOLDEN, index=False)
    print(f"wrote {len(fp)} fingerprints -> {GOLDEN}")
    ray.shutdown()


if __name__ == "__main__":
    main()
