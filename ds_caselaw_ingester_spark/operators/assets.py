"""Asset effect derivation — the reference's `save_files_to_s3`
(ingester.py:361-418) and publish asset-copy (docs/workflow.md:169-175)
as set-oriented fan-outs.

One input row (uri, ref, source_filename, images[]) fans out to the
asset rows the reference writes imperatively:

    seq 1  tar         uri/{ref}.tar.gz, '_nodocx' inserted when no source
    seq 2  source_doc  uri/{uri with '/'->'_'}.{ext}, skipped when no source
    seq 3  parser_log  uri/parser.log, gated on the member existing
                       (suppress(FileNotFoundException), ingester.py:396-405)
    seq 4  image       uri/{image} per element of the TRE images list

`effect_seq` carries the reference's write order (K13) as data. All
expressions are built-in (codegen'd, zero Python); the only shuffle a
consumer pays is whatever it does next — the fan-out itself is map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.functions.scalars import file_extension, modify_filename


def asset_rows(
    src: DataFrame,
    id_cols: list[str],
    has_parser_log: Column | None = None,
) -> DataFrame:
    """K6-K10 fan-out. `src` needs columns: uri, ref, source_filename,
    images (array<string>, NULL/empty -> no image rows) plus `id_cols`.
    Output: id_cols + (effect_seq, asset_kind, s3_key).

    has_parser_log: optional boolean column gating the parser.log row —
    the reference only copies the member when it exists in the tar.
    """
    uri = F.col("uri")
    ids = [F.col(c) for c in id_cols]
    tar_name = F.when(
        F.col("source_filename").isNull(),
        modify_filename(F.concat(F.col("ref"), F.lit(".tar.gz")), "_nodocx"),
    ).otherwise(F.concat(F.col("ref"), F.lit(".tar.gz")))
    tar_rows = src.select(
        *ids,
        F.lit(1).alias("effect_seq"),
        F.lit("tar").alias("asset_kind"),
        F.concat(uri, F.lit("/"), tar_name).alias("s3_key"),
    )
    source_rows = src.where(F.col("source_filename").isNotNull()).select(
        *ids,
        F.lit(2).alias("effect_seq"),
        F.lit("source_doc").alias("asset_kind"),
        F.concat(
            uri,
            F.lit("/"),
            F.replace(uri, F.lit("/"), F.lit("_")),
            F.lit("."),
            file_extension(F.col("source_filename")),
        ).alias("s3_key"),
    )
    logs_src = src if has_parser_log is None else src.where(has_parser_log)
    log_rows = logs_src.select(
        *ids,
        F.lit(3).alias("effect_seq"),
        F.lit("parser_log").alias("asset_kind"),
        F.concat(uri, F.lit("/parser.log")).alias("s3_key"),
    )
    image_rows = src.withColumn("_img", F.explode(F.col("images"))).select(
        *ids,
        F.lit(4).alias("effect_seq"),
        F.lit("image").alias("asset_kind"),
        F.concat(uri, F.lit("/"), F.col("_img")).alias("s3_key"),
    )
    return tar_rows.unionAll(source_rows).unionAll(log_rows).unionAll(image_rows)


def publish_copies(assets: DataFrame, publish_uris: DataFrame) -> DataFrame:
    """K11 asset-copy: on publish, every asset under the document's prefix
    is copied private -> public (docs/workflow.md:169-175). `publish_uris`
    is the (uri) set being published this batch; the join keeps only their
    assets and emits one copy row per asset."""
    return assets.join(publish_uris.select("uri").distinct(), "uri").select(
        "uri",
        "s3_key",
        F.lit("unpublished").alias("from_bucket"),
        F.lit("published").alias("to_bucket"),
    )
