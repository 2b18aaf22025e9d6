"""Table readers (SURVEY.md §2.1 S1).

The reference eagerly loads Excel extracts with inferred schemas
(SL_SPK_Cleansing.py:40-55); our engine reads columnar parquet with
declared schemas (schemas.py) — scans get predicate pushdown, column
pruning, and vectorized decoding from Spark for free. CSV/xlsx ingest
is an edge converter, not an engine concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spk_sl_validation_spark import schemas


_TS_NANOS_PATHS: dict[tuple[str, float, int], bool] = {}


def _events_ts_is_nanos(path: str) -> bool:
    """True iff ``ts`` in the parquet footer is TIMESTAMP(NANOS).

    The driver's testdata generator has shipped events.ts as both
    NANOS and MICROS across rounds; NANOS needs the ``nanosAsLong``
    legacy path (Spark's vectorized reader rejects it), MICROS reads
    natively. One footer read per file version — the cache is keyed on
    (path, mtime, size) so a file regenerated in place with a different
    unit re-probes instead of reusing a stale verdict (a stale NANOS
    verdict on a MICROS file would yield timestamps off by 1000x).
    A missing ``ts`` field means "not nanos"; any other probe failure
    (I/O, pyarrow) propagates — silently assuming MICROS would trade a
    clear error here for a confusing vectorized-reader error later.
    """
    import os

    st = os.stat(path)
    key = (path, st.st_mtime, st.st_size)
    if key not in _TS_NANOS_PATHS:
        import pyarrow.parquet as pq

        try:
            field = pq.ParquetFile(path).schema_arrow.field("ts")
        except KeyError:
            _TS_NANOS_PATHS[key] = False
        else:
            _TS_NANOS_PATHS[key] = getattr(field.type, "unit", None) == "ns"
    return _TS_NANOS_PATHS[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-testdata table with its declared schema.

    Passing the explicit schema (rather than letting parquet supply
    it) validates the contract and lets Catalyst prune columns that a
    query never touches.

    When ``events.ts`` is stored as parquet TIMESTAMP(NANOS) (which
    Spark's vectorized reader rejects) we read it as raw nanos
    (``nanosAsLong``) and convert to a microsecond timestamp
    (``ts div 1000`` — matches DuckDB's truncation of ns → µs);
    TIMESTAMP(MICROS) files read natively.
    """
    # Defensive: timestamp parity with the DuckDB oracle requires UTC
    # rendering even if the hosting session was built without our conf.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events" and _events_ts_is_nanos(f"{sf_dir}/{name}.parquet"):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        physical = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType(), True)
                for f in schemas.EVENTS.fields
            ]
        )
        df = spark.read.schema(physical).parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)")).select(
            *[f.name for f in schemas.EVENTS.fields]
        )
    schema = schemas.TESTDATA_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    names = names or list(schemas.TESTDATA_SCHEMAS)
    return {n: load_table(spark, sf_dir, n) for n in names}


def load_csv_table(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """CSV source with a declared schema (SURVEY.md §2.1 S1's second
    format). An explicit schema skips the inference pass (one full
    extra scan at 100 TB) and pins types against drift; malformed rows
    surface in ``_corrupt_record`` rather than silently nulling."""
    return spark.read.csv(path, schema=schema, header=header, mode="PERMISSIVE")


def read_xlsx_table(
    spark: SparkSession, path: str, sheet_name: str | int = 0, schema: T.StructType | None = None
) -> DataFrame:
    """Edge converter for the reference's xlsx sources (SURVEY.md §2.1
    S1: ``pd.read_excel`` over SAP extracts). Driver-side pandas read →
    Spark DataFrame; only sane for dim-sized human-maintained inputs —
    engine-scale data arrives as parquet. Import-guarded: requires an
    xlsx engine (openpyxl), which the engine core never needs.
    """
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "read_xlsx_table requires openpyxl; convert the workbook to "
            "parquet/csv out of band, or install an xlsx engine"
        ) from e
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet_name, engine="openpyxl")
    return spark.createDataFrame(pdf, schema=schema)


def load_orc_table(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC source — the other columnar format large warehouses hand
    off (Hive-lineage lakes). Native vectorized reader with the same
    pushdown/pruning surface as parquet; a declared schema pins types
    and skips footer-merge inference across many files.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def load_jsonl_table(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-Lines source with a declared schema — the de-facto
    interchange format for document/training-data corpora. An explicit
    schema avoids the inference scan (a full extra pass over 100 TB)
    and keeps the reader a single streaming decode per file split;
    malformed lines land in ``_corrupt_record`` when the schema
    declares it (PERMISSIVE) instead of failing the job.
    """
    return spark.read.json(path, schema=schema, mode="PERMISSIVE")


def load_xml_table(
    spark: SparkSession, path: str, row_tag: str, schema: T.StructType
) -> DataFrame:
    """XML source (native in Spark 4 — the merged spark-xml reader)
    with a declared schema: each ``row_tag`` element becomes a row.

    Same policy as :func:`load_jsonl_table`: the explicit schema
    skips the inference pass (a full extra scan at 100 TB) and pins
    types independent of element order; attributes surface as
    ``_attrName`` fields when declared. XML is the interchange edge
    for the reference's SAP-flavored domain (IDoc/ALE exports) —
    parse at the edge, convert to parquet for the hot path, exactly
    like the xlsx edge converter (readers.py:102).
    """
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(schema)
        .load(path)
    )
