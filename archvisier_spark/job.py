"""spark-submit entrypoint — the north rule's packaging surface.

Usage (cluster)::

    scripts/package.sh                         # builds dist/engine.zip
    spark-submit --py-files dist/engine.zip \\
        archvisier_spark/job.py \\
        --input  s3://bucket/documents_web    \\
        --output s3://bucket/extracted        \\
        --checkpoint s3://bucket/extract_ckpt \\
        --n-chunks 4096 --finalize

Local smoke::

    python archvisier_spark/job.py --synthesize 200 \\
        --output /tmp/out --checkpoint /tmp/ckpt --n-chunks 8 --finalize

Resumable by construction: re-running the same command after any failure
skips completed chunks and replaces half-written ones
(archvisier_spark.pipeline.lineage).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="ArchVisier-Spark extraction job")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet/Iceberg path of documents_web table")
    src.add_argument("--synthesize", type=int, metavar="N",
                     help="generate an N-doc deterministic corpus instead of reading input")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--n-chunks", type=int, default=64)
    p.add_argument("--max-chunks-per-run", type=int, default=None)
    p.add_argument("--language", default=None,
                   help="OCR language (default: config file's ocr_language, or auto)")
    p.add_argument("--work-mode", default="KP")
    p.add_argument("--ocr-mode", default="text", choices=("text", "raster"),
                   help="PDF recovery path: 'text' reads content streams; "
                        "'raster' runs the reference's real OCR flow "
                        "(Poppler rasterize + Tesseract per page — needs the "
                        "cluster image's binaries, docker/Dockerfile.cluster; "
                        "where absent each PDF becomes a BŁĄD TECHNICZNY OCR: "
                        "data row, never a task failure)")
    p.add_argument("--config", default=None,
                   help="config.json path (S11: reference-compatible keys incl. "
                        "ocr_language/ocr_psm/ocr_oem; odd-kernel coercion applied)")
    p.add_argument("--master", default=None, help="override master (default: spark-submit's)")
    p.add_argument("--finalize", action="store_true",
                   help="after all chunks complete, write numbered+named output")
    p.add_argument("--export-xlsx", default=None, metavar="PATH",
                   help="with --finalize: also write the styled XLSX results "
                        "workbook (the reference's export artifact, "
                        "pdf_processor_app.py:1023-1122) via the from-scratch "
                        "stdlib OOXML writer")
    p.add_argument("--assume-sorted-urls", action="store_true",
                   help="input/output is stored sorted by url (Iceberg sort "
                        "order): numbering skips the payload re-attach join "
                        "(zero-shuffle fast path; fails fast if unsorted)")
    args = p.parse_args(argv)
    if args.export_xlsx and not args.finalize:
        # a silently ignored export is worse than a crash: the workbook
        # only exists after finalize assembles the named output
        p.error("--export-xlsx requires --finalize")

    from archvisier_spark.kernel.config import load_settings
    from archvisier_spark.session import get_spark
    from archvisier_spark.corpus import corpus_df
    from archvisier_spark.pipeline.lineage import (
        completed_chunks, finalize_names, lineage_report, run_resumable,
    )

    if args.config is not None and not Path(args.config).exists():
        # fail fast: a typo'd --config path silently disabling auto
        # language detection (and every other knob) is worse than a crash
        p.error(f"--config file not found: {args.config}")
    settings = load_settings(args.config)
    # CLI --language overrides the config file; neither → "auto" (the
    # two-pass per-page decision, kernel.document.ocr_page_auto)
    language = args.language or (
        settings.ocr_language if args.config else "auto"
    )

    spark = get_spark(master=args.master, app_name="archvisier_extract")
    docs = (
        corpus_df(spark, args.synthesize, skew_every=100, skew_factor=500)
        if args.synthesize
        else spark.read.parquet(args.input)
    )

    processed = run_resumable(
        spark,
        docs,
        args.output,
        args.checkpoint,
        n_chunks=args.n_chunks,
        max_chunks_per_run=args.max_chunks_per_run,
        language=language,
        work_mode=args.work_mode,
        ocr_mode=args.ocr_mode,
    )
    done = completed_chunks(spark, args.checkpoint)
    report = {
        "chunks_processed_this_run": processed,
        "chunks_complete": len(done),
        "chunks_total": args.n_chunks,
    }

    if args.finalize and len(done) == args.n_chunks:
        named = finalize_names(spark, args.output, work_mode=args.work_mode,
                               assume_sorted=args.assume_sorted_urls)
        named.write.mode("overwrite").parquet(args.output.rstrip("/") + "_named")
        report["finalized_rows"] = spark.read.parquet(
            args.output.rstrip("/") + "_named"
        ).count()
        if args.export_xlsx:
            from archvisier_spark.pipeline.training import export_results_xlsx

            export_results_xlsx(
                spark.read.parquet(args.output.rstrip("/") + "_named"),
                args.export_xlsx,
            )
            report["xlsx"] = args.export_xlsx
    elif args.export_xlsx:
        # --finalize given but chunks incomplete this run: say so in the
        # report instead of silently writing nothing
        report["xlsx_skipped"] = (
            f"chunks incomplete ({len(done)}/{args.n_chunks}) — "
            "re-run to finish and export"
        )

    lineage = lineage_report(spark, args.checkpoint)
    report["lineage_docs"] = lineage.groupBy().sum("n_docs").collect()[0][0]
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    # invoked as a file path (python archvisier_spark/job.py …): the script
    # dir, not the repo root, is on sys.path — add the package's parent so
    # the engine imports resolve (spark-submit --py-files does this via the
    # shipped zip)
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
