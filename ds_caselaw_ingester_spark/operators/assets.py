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

Content fidelity: the reference copies actual object bytes — the whole
archive for the tar row (ingester.py:373-380) and the tar member at
`{ref}/{filename}` for source-doc / parser.log / images via copy_file
(ingester.py:383-418, file_helpers.py:36-73). When the exploded member
rows (sources/tar.py explode_tar_members) and/or the archive frame are
supplied, each asset row carries `content_md5` of exactly those bytes,
so sink rows — and the K11 publish copies derived from them — are
byte-verifiable. The hash is computed JVM-side (F.md5 over binary) and
attached by keyed left joins; member bytes never widen the fan-out rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.functions.scalars import file_extension, modify_filename


def member_hash_index(members: DataFrame) -> DataFrame:
    """(ref, member_name, content_md5) — one row per member path, LAST
    occurrence wins when a tar contains duplicate names (Python tarfile's
    getmember returns the last member too, so the reference's copy_file
    reads the same bytes). The md5 runs where the bytes already live; only
    the 32-char hash shuffles into the asset join.

    member_index is REQUIRED: it is the archive ordinal that makes
    'last occurrence wins' deterministic. explode_tar_members always
    supplies it; a frame without it would silently rank duplicate names
    by a constant (arbitrary pick, varying across runs), so that is a
    hard error rather than a fallback."""
    if "member_index" not in members.columns:
        raise ValueError(
            "member_hash_index requires a member_index column (the archive "
            "ordinal from explode_tar_members) to make last-occurrence-wins "
            "deterministic for duplicate member names"
        )
    w = Window.partitionBy("consignment_ref", "member_name").orderBy(
        F.col("member_index").desc()
    )
    idx = members.select(
        "consignment_ref",
        "member_name",
        "member_index",
        F.md5(F.col("content")).alias("content_md5"),
    )
    return (
        idx.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("consignment_ref").alias("ref"),
            "member_name",
            "content_md5",
        )
    )


def asset_rows(
    src: DataFrame,
    id_cols: list[str],
    has_parser_log: Column | None = None,
    members: DataFrame | None = None,
    archives: DataFrame | None = None,
) -> DataFrame:
    """K6-K10 fan-out. `src` needs columns: uri, ref, source_filename,
    images (array<string>, NULL/empty -> no image rows) plus `id_cols`.
    Output: id_cols + (effect_seq, asset_kind, s3_key); when content is
    attachable (see below) also content_md5.

    has_parser_log: optional boolean column gating the parser.log row —
    the reference only copies the member when it exists in the tar.

    members: optional exploded tar members (consignment_ref, member_name,
    [member_index], content) — when given WITH a content column, source-
    doc / parser-log / image rows carry md5 of the member at
    `{ref}/{filename}`, the exact path the reference's copy_file reads.
    archives: optional (consignment_ref, content) raw archive frame — the
    tar row then carries md5 of the whole archive, which is what the
    reference stores (it copies the original tar.gz, not a member).
    """
    uri = F.col("uri")
    ids = [F.col(c) for c in id_cols]
    attach = members is not None and "content" in members.columns
    midx = member_hash_index(members) if attach else None

    def _with_member_md5(rows: DataFrame, fname: Column) -> DataFrame:
        """Left-join content_md5 for the member at ref/fname."""
        if not attach:
            return rows
        keyed = rows.withColumn(
            "_member", F.concat(F.col("ref"), F.lit("/"), fname)
        )
        return keyed.join(
            midx,
            (keyed["ref"] == midx["ref"]) & (keyed["_member"] == midx["member_name"]),
            "left",
        ).drop(midx["ref"]).drop("_member", "member_name")

    tar_name = F.when(
        F.col("source_filename").isNull(),
        modify_filename(F.concat(F.col("ref"), F.lit(".tar.gz")), "_nodocx"),
    ).otherwise(F.concat(F.col("ref"), F.lit(".tar.gz")))
    out_cols = [
        "effect_seq",
        "asset_kind",
        "s3_key",
        *(["content_md5"] if attach else []),
    ]

    tar_src = src
    if attach:
        if archives is not None:
            tar_md5 = archives.select(
                F.col("consignment_ref").alias("ref"),
                F.md5(F.col("content")).alias("content_md5"),
            )
            tar_src = src.join(tar_md5, "ref", "left")
        else:
            tar_src = src.withColumn("content_md5", F.lit(None).cast("string"))
    tar_rows = tar_src.select(
        *ids,
        F.lit(1).alias("effect_seq"),
        F.lit("tar").alias("asset_kind"),
        F.concat(uri, F.lit("/"), tar_name).alias("s3_key"),
        *(["content_md5"] if attach else []),
    )

    source_base = src.where(F.col("source_filename").isNotNull())
    source_rows = _with_member_md5(source_base, F.col("source_filename")).select(
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
        *(["content_md5"] if attach else []),
    )

    logs_src = src if has_parser_log is None else src.where(has_parser_log)
    log_rows = _with_member_md5(logs_src, F.lit("parser.log")).select(
        *ids,
        F.lit(3).alias("effect_seq"),
        F.lit("parser_log").alias("asset_kind"),
        F.concat(uri, F.lit("/parser.log")).alias("s3_key"),
        *(["content_md5"] if attach else []),
    )

    image_base = src.withColumn("_img", F.explode(F.col("images")))
    image_rows = _with_member_md5(image_base, F.col("_img")).select(
        *ids,
        F.lit(4).alias("effect_seq"),
        F.lit("image").alias("asset_kind"),
        F.concat(uri, F.lit("/"), F.col("_img")).alias("s3_key"),
        *(["content_md5"] if attach else []),
    )
    out = tar_rows.unionAll(source_rows).unionAll(log_rows).unionAll(image_rows)
    return out.select(*[F.col(c) for c in id_cols], *out_cols)


def publish_copies(assets: DataFrame, publish_uris: DataFrame) -> DataFrame:
    """K11 asset-copy: on publish, every asset under the document's prefix
    is copied private -> public (docs/workflow.md:169-175). `publish_uris`
    is the (uri) set being published this batch; the join keeps only their
    assets and emits one copy row per asset. content_md5 (when the asset
    rows carry it) rides along, so each copy row pins the bytes copied."""
    extra = ["content_md5"] if "content_md5" in assets.columns else []
    return assets.join(publish_uris.select("uri").distinct(), "uri").select(
        "uri",
        "s3_key",
        F.lit("unpublished").alias("from_bucket"),
        F.lit("published").alias("to_bucket"),
        *extra,
    )
