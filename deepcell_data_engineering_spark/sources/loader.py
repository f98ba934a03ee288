"""Declarative ontology source — the S-group loader family (SURVEY §2.1).

The reference's ``UniversalDataLoader`` (pre_annotation/data_loader.py:76-445)
walks a 7-level directory ontology (imaging_type / specimen_type /
compartment / marker / exp_id / session / position), filters directories
against a user spec where ``'all'`` is a wildcard, and eagerly reads TIFFs
into one dense array.

Spark-native re-expression: the ontology levels are **partition columns**
of a parquet (or binaryFile) source. The user spec becomes a conjunction
of ``IN`` predicates on those columns; ``'all'`` contributes no predicate.
Catalyst turns the predicates into **partition pruning** — the directory
walk the reference hand-rolls (data_loader.py:191-318) — so at 100 TB a
spec that pins ``exp_id`` touches only that experiment's files, never
listing the rest.

Operator map (reference file:line → here):
  S1 spec object               data_loader.py:76-108  -> OntologySpec
  S2 vocabulary canonicalize   data_loader.py:110-146 -> canonicalize_vocab
  S3 wildcard levels           data_loader.py:148-167 -> OntologySpec.wildcard_levels
  S5 path assembly / pruning   data_loader.py:191-318 -> ontology_filter (Catalyst prunes)
  S6 catalog sanity            data_loader.py:320-331 -> datasets_available
  S7 compatibility check       data_loader.py:333-361 -> check_compatibility
  S8 metadata load             data_loader.py:363-394 -> load_metadata
  S9 ragged stack load/pad     data_loader.py:396-445 -> pad_ragged_stacks
  S10 single-image decode      utils/misc_utils.py:41-48 -> decode_image (gated import)
  S11 natural-sorted listing   utils/misc_utils.py:35-38,51-137 -> natural_sort_key
  S12 per-channel zip          utils/misc_utils.py:72-104 -> zip_channel_files
  S14 saved-file ambiguity     utils/io_utils.py:136-163 -> resolve_saved_files
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ONTOLOGY_LEVELS = [
    "imaging_type",
    "specimen_type",
    "compartment",
    "marker",
    "exp_id",
    "session",
    "position",
]

# S2: canonical spellings per level (data_loader.py:110-146). Keyed by the
# canonical form; any listed variant (lowercased) maps to it.
_CANONICAL_VOCAB = {
    "imaging_type": {
        "fluo": {"flourescent", "fluorescence", "fluorescent", "fluo"},
        "phase": {"phase"},
    },
    "compartment": {
        "Nuclear": {"nuc", "nuclear"},
        "WholeCell": {"wholecell", "whole_cell", "whole cell"},
    },
}


def canonicalize_vocab(level: str, values: list[str]) -> list[str]:
    """Map common misspellings to canonical vocabulary (S2). Unknown terms
    pass through unchanged; matching is case-insensitive."""
    table = _CANONICAL_VOCAB.get(level)
    if not table:
        return list(values)
    out = []
    for v in values:
        lowered = v.lower()
        for canonical, variants in table.items():
            if lowered in variants or lowered == canonical.lower():
                out.append(canonical)
                break
        else:
            out.append(v)
    return out


@dataclass
class OntologySpec:
    """Declarative source spec (S1). Each level is ``'all'`` (wildcard) or
    a list of values; vocabulary is canonicalized at construction."""

    imaging_type: list[str] | str = "all"
    specimen_type: list[str] | str = "all"
    compartment: list[str] | str = "all"
    marker: list[str] | str = "all"
    exp_id: list[str] | str = "all"
    session: list[str] | str = "all"
    position: list[str] | str = "all"
    file_type: str = ".tif"
    _levels: dict = field(init=False, repr=False)

    def __post_init__(self) -> None:
        # phase-only imaging may omit compartment (data_loader.py:87-88);
        # normalize+canonicalize imaging_type FIRST so 'phase', ['phase'],
        # and ['Phase'] all qualify
        imaging = self.imaging_type
        if isinstance(imaging, str):
            imaging = [imaging]
        imaging = canonicalize_vocab("imaging_type", [str(v).lower() for v in imaging])
        if self.compartment is None:
            if imaging != ["phase"]:
                raise ValueError("compartment not specified (required unless imaging_type == ['phase'])")
            self.compartment = "all"
        self._levels = {}
        for name in ONTOLOGY_LEVELS:
            raw = getattr(self, name)
            if isinstance(raw, str):
                raw = [raw]
            if len(raw) == 1 and isinstance(raw[0], str) and raw[0].lower() == "all":
                self._levels[name] = None  # wildcard
            else:
                self._levels[name] = canonicalize_vocab(name, list(raw))

    def wildcard_levels(self) -> list[str]:
        """Levels with no predicate (S3 `_calc_upper_bound`)."""
        return [k for k, v in self._levels.items() if v is None]

    def predicates(self) -> list[Column]:
        """One IN predicate per pinned level; wildcards contribute none.
        Catalyst pushes these into partition pruning (S5)."""
        return [
            F.col(name).isin(vals)
            for name, vals in self._levels.items()
            if vals is not None
        ]


def ontology_filter(df: DataFrame, spec: OntologySpec) -> DataFrame:
    """Apply an OntologySpec to a source whose ontology levels are
    (partition) columns. The returned plan prunes partitions — the Spark
    equivalent of the reference's manual path assembly (S5)."""
    for pred in spec.predicates():
        df = df.filter(pred)
    return df


def read_ontology_tree(spark: SparkSession, root: str, spec: OntologySpec | None = None) -> DataFrame:
    """Scan an ontology-partitioned parquet tree, optionally pre-filtered
    by a spec. ``basePath`` keeps the partition columns in the schema."""
    df = spark.read.option("basePath", root).parquet(root)
    return ontology_filter(df, spec) if spec is not None else df


def datasets_available(df: DataFrame, min_files: int = 1) -> DataFrame:
    """Catalog sanity (S6): per ontology leaf, how many units exist;
    flags empty/singleton leaves the way `_datasets_available` prints
    warnings (data_loader.py:320-331)."""
    present = [lvl for lvl in ONTOLOGY_LEVELS if lvl in df.columns]
    return (
        df.groupBy(*present)
        .agg(F.count(F.lit(1)).alias("n_files"))
        .withColumn("sparse", F.col("n_files") <= F.lit(min_files))
    )


def check_compatibility(meta: DataFrame, cols: tuple[str, ...] = ("dim_x", "dim_y", "pixel_size", "magnification")) -> bool:
    """S7 `_check_compatibility` (data_loader.py:333-361): all selected
    datasets must agree on frame dims / pixel size / magnification —
    one countDistinct aggregate instead of a Python loop."""
    aggs = [F.countDistinct(c).alias(c) for c in cols if c in meta.columns]
    if not aggs:
        return True
    row = meta.agg(*aggs).collect()[0]
    return all(v <= 1 for v in row.asDict().values())


def load_metadata(spark: SparkSession, glob_path: str) -> DataFrame:
    """S8 `load_metadata` (data_loader.py:363-394): read per-experiment
    JSON metadata documents into one DataFrame. List-valued fields are
    concatenated to strings (`:385-386` str.cat → array_join), incomplete
    rows dropped (`:387` dropna → na.drop), and the source file retained
    so image paths can be joined back (J1)."""
    df = spark.read.option("multiLine", "true").json(glob_path)
    df = df.withColumn("metadata_path", F.input_file_name())
    for fld in df.schema.fields:
        if fld.dataType.typeName() == "array":
            # stringify elements first: array_join requires array<string>,
            # but JSON lists may infer numeric (e.g. {"dims": [512, 512]})
            df = df.withColumn(
                fld.name,
                F.array_join(
                    F.transform(F.col(fld.name), lambda x: x.cast("string")), " "
                ),
            )
    return df.na.drop(how="any", subset=[f.name for f in df.schema.fields if f.name != "metadata_path"])


def pad_ragged_stacks(images: DataFrame, blank_payload: bytes | None = None) -> DataFrame:
    """S9/A10: different fovs may carry different stack counts; pad every
    fov to the global max with blank frames (data_loader.py:431-443 zero-
    pads the dense array).

    Relational form: max(stack)+1 over all rows (broadcast scalar via a
    windowless cross agg), generate the full (fov x stack) key grid with
    ``sequence``+``explode``, left-anti join to find holes, and union
    blank rows. No driver loop, no skew: the grid is derived per fov."""
    per_fov = (
        images.groupBy("fov")
        .agg(
            F.first("height").alias("height"),
            F.first("width").alias("width"),
            F.first("channels").alias("channels"),
            F.first("compartment").alias("compartment"),
        )
    )
    global_max = images.agg(F.max("stack")).collect()[0][0]
    if global_max is None:
        return images
    full_grid = per_fov.select(
        "fov", "height", "width", "channels", "compartment",
        F.explode(F.sequence(F.lit(0), F.lit(int(global_max)))).alias("stack"),
    )
    holes = (
        # left-anti against existing keys fills BOTH interior gaps (a fov
        # with stacks {0, 3}) and short tails, per the full-grid design
        full_grid.join(images.select("fov", "stack"), on=["fov", "stack"], how="left_anti")
        .withColumn("crop", F.lit(0))
        .withColumn("slice", F.lit(0))
        .withColumn("X", F.lit(blank_payload).cast("binary"))
        .withColumn("y", F.lit(None).cast("binary"))
    )
    return images.unionByName(holes.select(*images.columns))


def decode_image(payload: bytes, fmt: str = "tif") -> np.ndarray:
    """S10 `get_image` (utils/misc_utils.py:41-48): decode one tif/png/jpg
    to float32. Prefers the full codec libraries (tifffile/PIL) when
    importable; otherwise the dependency-free codecs in
    sources/pycodecs.py and sources/pyjpeg.py decode TIFF (uncompressed
    / LZW / Deflate / PackBits, strip or tile), PNG (all filters,
    palette, Adam7), and baseline JPEG — so the decode is REAL in this
    environment, not a stub. Remaining exotica (progressive JPEG, CCITT
    TIFF) raise, naming the feature."""
    import io

    if fmt in ("tif", "tiff"):
        try:  # pragma: no cover - exercised only where libs exist
            import tifffile

            return np.asarray(tifffile.imread(io.BytesIO(payload)), dtype=np.float32)
        except ImportError:
            from deepcell_data_engineering_spark.sources.pycodecs import decode_tiff

            return decode_tiff(payload).astype(np.float32)
    try:  # pragma: no cover - exercised only where libs exist
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)), dtype=np.float32)
    except ImportError as exc:
        if fmt == "png":
            from deepcell_data_engineering_spark.sources.pycodecs import decode_png

            return decode_png(payload).astype(np.float32)
        if fmt in ("jpg", "jpeg"):
            from deepcell_data_engineering_spark.sources.pyjpeg import decode_jpeg

            return decode_jpeg(payload).astype(np.float32)
        raise NotImplementedError(
            f"image codec for {fmt!r} not installed in this environment "
            "(pycodecs/pyjpeg cover tif/png/jpg)"
        ) from exc


def natural_sort_key(col: Column | str) -> list[Column]:
    """S11/F6 `sorted_nicely` (utils/misc_utils.py:35-38): alphanumeric
    natural order as a composite ORDER BY key — (text-with-digits-blanked,
    first-number) — entirely JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    # compare EVERY numeric group, not just the first ('d1_9' < 'd1_10'):
    # left-pad each number to fixed width so lexicographic array order
    # equals numeric order, like the reference's per-chunk int comparison
    nums = F.transform(
        F.regexp_extract_all(c, F.lit(r"([0-9]+)"), 1),
        lambda x: F.lpad(x, 20, "0"),
    )
    return [
        F.regexp_replace(c, r"[0-9]+", ""),
        nums,
        c,
    ]


def natural_sorted(df: DataFrame, col: str) -> DataFrame:
    return df.orderBy(*natural_sort_key(col))


def zip_channel_files(per_channel: dict[str, DataFrame], name_col: str = "path") -> DataFrame:
    """S12 `get_images_from_directory` (utils/misc_utils.py:72-104): the
    reference builds a multichannel stack by zipping each channel's
    natural-sorted file list positionally. Relational form: per-channel
    ``row_number`` over the natural order is the join key; channels then
    pivot into one row per frame index.

    Input: {channel_name: DataFrame[path, ...]}; output:
    DataFrame[frame_idx, <channel_name>...] with one path column per
    channel."""
    joined: DataFrame | None = None
    for chan, df in per_channel.items():
        w = Window.orderBy(*natural_sort_key(name_col))
        keyed = df.select(
            (F.row_number().over(w) - 1).alias("frame_idx"),
            F.col(name_col).alias(chan),
        )
        joined = keyed if joined is None else joined.join(keyed, "frame_idx", "inner")
    if joined is None:
        raise ValueError("no channels given")
    return joined.orderBy("frame_idx")


def resolve_saved_files(df: DataFrame, key_cols: list[str], name_col: str = "path") -> DataFrame:
    """S14 `get_saved_file_path` (utils/io_utils.py:136-163): one saved
    file per unit key; multiple save versions is an error. Relational
    form: count per key, HAVING count > 1 raises."""
    counts = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"), F.min(name_col).alias(name_col)
    )
    dupes = counts.filter(F.col("n") > 1).limit(1).collect()
    if dupes:
        raise ValueError(f"multiple save versions for unit key {dupes[0].asDict()}")
    return counts.drop("n")


def read_images_native(spark: SparkSession, path: str) -> DataFrame:
    """JVM-native image scan: Spark's built-in ``image`` source decodes
    PNG/JPEG/GIF/BMP through javax.imageio INSIDE the executors — zero
    Python in the decode path, the fastest fleet-wide option for the
    formats it covers (microscope TIFFs still go through binaryFile +
    pycodecs). Returns one row per file with (origin, height, width,
    n_channels, data) where ``data`` is the raw pixel buffer in
    ImageSchema's layout: 8-bit, row-major, BGR(A) channel order — use
    image_rgb_array to get an RGB numpy array back.

    Doubles as an independent cross-check of our encoders: javax.imageio
    accepts pycodecs/pyjpeg streams byte-for-byte (pinned in
    tests/test_pycodecs.py)."""
    df = spark.read.format("image").load(path)
    return df.select(
        F.col("image.origin").alias("origin"),
        F.col("image.height").alias("height"),
        F.col("image.width").alias("width"),
        F.col("image.nChannels").alias("n_channels"),
        F.col("image.mode").alias("mode"),
        F.col("image.data").alias("data"),
    )


def image_rgb_array(row) -> np.ndarray:
    """Convert one read_images_native row to an (h, w, c) uint8 RGB(A)
    array (ImageSchema stores BGR(A))."""
    a = np.frombuffer(bytes(row["data"]), dtype=np.uint8).reshape(
        row["height"], row["width"], row["n_channels"]
    )
    if row["n_channels"] >= 3:  # BGR(A) -> RGB(A)
        a = np.concatenate([a[..., 2::-1], a[..., 3:]], axis=2)
    return a
