"""Command-line entry: run the reference-parity pipelines end-to-end.

A user of the reference repo runs its scripts top-to-bottom and gets
multi-sheet Excel workbooks; the drop-in equivalent here:

    python -m spk_sl_validation_spark spk-sl   --out /tmp/report [--xlsx report.xlsx]
    python -m spk_sl_validation_spark status   --out /tmp/report_status
    python -m spk_sl_validation_spark bench    # one-line JSON benchmark

Input defaults to the synthetic fixture tables (sources/fixtures.py);
pass ``--tables DIR`` to read parquet extracts named after the SAP
tables (EORD.parquet, MARC.parquet, ...) instead. Every report ships a
manifest.json of (n_rows, checksum) per sheet (sinks.dataset_checksum)
so consumers can verify the export.
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime


def _load_tables(spark, tables_dir: str | None, names: list[str]):
    from spk_sl_validation_spark.sources import fixtures as FX

    if tables_dir is None:
        return FX.build_tables(spark), FX.RUN_TS
    tables = {
        name: spark.read.parquet(f"{tables_dir}/{name}.parquet") for name in names
    }
    return tables, datetime.now()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="spk_sl_validation_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for cmd in ("spk-sl", "status"):
        p = sub.add_parser(cmd)
        p.add_argument("--out", required=True, help="report output directory (parquet per sheet)")
        p.add_argument("--tables", default=None, help="directory of <TABLE>.parquet inputs (default: synthetic fixtures)")
        p.add_argument("--run-ts", default=None, help="pipeline 'now' as ISO timestamp (default: fixture RUN_TS / wall clock)")
        p.add_argument("--xlsx", default=None, help="also write a human-facing xlsx workbook here")
        p.add_argument("--variant", default="CL", choices=("CL", "V1"), help="spk-sl only: pipeline generation")
    sub.add_parser("bench")

    args = ap.parse_args(argv)

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    from pyspark.sql import SparkSession

    from spk_sl_validation_spark.session import build_session
    from spk_sl_validation_spark.sources.sinks import write_report_with_manifest

    # getOrCreate may return a session owned by the caller (tests, a
    # notebook) — only stop what we actually created.
    owns_session = SparkSession.getActiveSession() is None
    spark = build_session(app_name=f"spk-sl-cli-{args.cmd}")
    try:
        if args.cmd == "spk-sl":
            from spk_sl_validation_spark.plans import spk_sl_cleansing as P

            names = ["EORD", "MARC", "MARA", "MVKE_3090", "GAR_Plants", "SPK_Xref", "MG5_Xref"]
            tables, default_ts = _load_tables(spark, args.tables, names)
            run_ts = datetime.fromisoformat(args.run_ts) if args.run_ts else default_ts
            variant = P.CL if args.variant == "CL" else P.V1
            sheets = P.run(tables, run_ts=run_ts, variant=variant)
        else:
            from spk_sl_validation_spark.plans import status_cleansing as S

            names = ["MARC", "MARA", "MB52", "GAR_Plants"]
            tables, _ = _load_tables(spark, args.tables, names)
            sheets = S.run(tables)

        manifest = write_report_with_manifest(sheets, args.out)
        for sheet, info in sorted(manifest.items()):
            print(f"{sheet}: {info['n_rows']} rows checksum={info['checksum']}")
        if args.xlsx:
            from spk_sl_validation_spark.sources.sinks import write_report_xlsx

            try:
                write_report_xlsx(sheets, args.xlsx)
                print(f"xlsx: {args.xlsx}")
            except RuntimeError as e:
                # parquet report already on disk — xlsx is a convenience copy
                print(f"xlsx skipped: {e}", file=sys.stderr)
        print(f"report written to {args.out}")
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
