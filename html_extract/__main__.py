"""CLI entry points: run the pipeline, extract one document, inspect.

    python -m html_extract extract --sf /root/testdata/sf0.001 --out /tmp/out
    python -m html_extract parse < page.html       # spans as JSON lines
    python -m html_extract serialize < page.html   # spec re-serialization
"""

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="html_extract")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("extract", help="run the full Ray pipeline")
    run.add_argument("--sf", required=True, help="input dir with documents.parquet")
    run.add_argument("--out", required=True, help="output dir")
    run.add_argument("--shards", type=int, default=4)
    run.add_argument("--batch-size", type=int, default=64)
    run.add_argument("--no-resume", action="store_true")

    sub.add_parser("parse", help="stdin HTML -> extracted spans (JSON lines)")
    ser = sub.add_parser("serialize", help="stdin HTML -> spec serialization")
    ser.add_argument(
        "--pretty",
        action="store_true",
        help="reformat whitespace (reference reformatWhitespace option)",
    )
    ser.add_argument("--indent-step", type=int, default=1)

    args = ap.parse_args(argv)

    if args.cmd == "extract":
        import ray

        if not ray.is_initialized():
            ray.init(
                address="local",
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
        from .pipeline import run_pipeline

        manifests = run_pipeline(
            args.sf,
            args.out,
            num_shards=args.shards,
            batch_size=args.batch_size,
            resume=not args.no_resume,
        )
        json.dump(manifests, sys.stdout, indent=1)
        print()
        ray.shutdown()
        return 0

    data = sys.stdin.buffer.read()
    if args.cmd == "parse":
        from .extract import extract_spans

        spans, meta = extract_spans(data)
        for i, (kind, text, ref) in enumerate(spans):
            print(
                json.dumps(
                    {"kind": kind, "text": text, "media_ref": ref, "order": i}
                )
            )
        print(json.dumps({"meta": meta}), file=sys.stderr)
        return 0
    if args.cmd == "serialize":
        from .parser import parse
        from .serializer import serialize

        print(
            serialize(
                parse(data).document,
                reformat_whitespace=args.pretty,
                indent_step=args.indent_step,
            )
        )
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
