"""MethylSession — the engine's replacement for the reference's mutable
``Samples`` object (reference samples.py:23-50).

The reference mutates ``_signal_df`` in place and invalidates caches by hand
(``reset_betas`` samples.py:1116-1120). Here every transform returns a NEW
session snapshot holding immutable DataFrames; Spark lineage makes
invalidation moot, and ``.persist()`` marks the two reuse points (the
preprocessed signal and betas).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pylluminator_spark.functions.methyl import beta_expr, meth_unmeth_exprs
from pylluminator_spark.operators import masks as mask_ops

SIGNAL_KEY_COLS = ("probe_id", "type", "channel", "probe_type", "mask_info")


def assemble_signal(
    idata: DataFrame,
    manifest: DataFrame,
    min_beads: int = 1,
) -> DataFrame:
    """Build the semi-wide signal fact table from long idata + manifest
    (reference ``add_annotation_info`` samples.py:468-570).

    Steps (each declarative — Catalyst prunes/pushes down):
    1. low-bead null-out (``n_beads < min_beads`` -> NULL, samples.py:494)
    2. manifest address explode: type I probes have two addresses
       (address_a=U, address_b=M, samples.py:541-542), type II one
    3. inner broadcast join idata <-> addresses on illumina_id
       (samples.py:525-528; the manifest is dimension-sized)
    4. methylation-state derivation (samples.py:538-542), dropping '?'
    5. pivot to one row per (sample, probe) with mg/mr/ug/ur columns —
       a single hash aggregation, not a pandas pivot
    """
    data = idata
    if min_beads > 1:
        low = F.col("n_beads") < min_beads
        data = data.withColumn(
            "mean_value", F.when(low, F.lit(None)).otherwise(F.col("mean_value"))
        )

    addresses = (
        manifest.select(
            "probe_id",
            "type",
            "channel",
            "probe_type",
            F.coalesce(F.col("mask_info"), F.lit("")).alias("mask_info"),
            F.explode(
                F.array(
                    F.struct(
                        F.col("address_a").alias("illumina_id"),
                        F.lit("A").alias("address_kind"),
                    ),
                    F.struct(
                        F.col("address_b").alias("illumina_id"),
                        F.lit("B").alias("address_kind"),
                    ),
                )
            ).alias("addr"),
        )
        .select(
            "probe_id",
            "type",
            "channel",
            "probe_type",
            "mask_info",
            F.col("addr.illumina_id").alias("illumina_id"),
            F.col("addr.address_kind").alias("address_kind"),
        )
        .filter(F.col("illumina_id").isNotNull())
    )

    joined = data.withColumnRenamed("channel", "signal_channel").join(
        F.broadcast(addresses), "illumina_id", "inner"
    )

    ms = (
        F.when((F.col("type") == "II") & (F.col("signal_channel") == "G"), "M")
        .when((F.col("type") == "II") & (F.col("signal_channel") == "R"), "U")
        .when((F.col("type") == "I") & (F.col("address_kind") == "B"), "M")
        .when((F.col("type") == "I") & (F.col("address_kind") == "A"), "U")
        .otherwise("?")
    )
    typed = joined.withColumn("meth_state", ms).filter(F.col("meth_state") != "?")

    cell = lambda sc, st: F.max(  # noqa: E731 — exactly one row per cell
        F.when(
            (F.col("signal_channel") == sc) & (F.col("meth_state") == st),
            F.col("mean_value"),
        )
    )
    return typed.groupBy("sample", *SIGNAL_KEY_COLS).agg(
        cell("G", "M").alias("mg"),
        cell("R", "M").alias("mr"),
        cell("G", "U").alias("ug"),
        cell("R", "U").alias("ur"),
    )


def min_beads_masks(signal: DataFrame, min_beads: int) -> DataFrame:
    """Per-sample min-beads masks: probes whose (G,M) or (R,U) cell is NULL
    (reference samples.py:568-570)."""
    return (
        signal.filter(F.col("mg").isNull() | F.col("ur").isNull())
        .select(
            F.lit(f"min_beads_{min_beads}").alias("mask_name"),
            F.col("sample"),
            F.col("probe_id"),
        )
        .distinct()
    )


@dataclass(frozen=True)
class MethylSession:
    """Immutable snapshot of an analysis: signal + dimensions + masks."""

    spark: SparkSession
    signal: DataFrame
    sample_sheet: DataFrame | None = None
    manifest: DataFrame | None = None
    masks: DataFrame | None = None
    min_beads: int = 1
    array_type: str | None = None

    @classmethod
    def from_idata(
        cls,
        spark: SparkSession,
        idata: DataFrame,
        manifest: DataFrame,
        sample_sheet: DataFrame | None = None,
        min_beads: int = 1,
        detect_array_type: bool = False,
    ) -> "MethylSession":
        """``detect_array_type=True`` infers the Illumina array generation
        from per-sample probe counts (reference annotations.py:360-397 via
        read_samples); it costs one count-distinct aggregation over idata,
        so it is opt-in."""
        signal = assemble_signal(idata, manifest, min_beads)
        masks = min_beads_masks(signal, min_beads)
        array_type = None
        if detect_array_type:
            from pylluminator_spark.annotations import consensus_array_type

            array_type = consensus_array_type(idata)
        return cls(
            spark=spark,
            signal=signal,
            sample_sheet=sample_sheet,
            manifest=manifest,
            masks=masks,
            min_beads=min_beads,
            array_type=array_type,
        )

    # -- masks ------------------------------------------------------------
    def with_signal(self, signal: DataFrame) -> "MethylSession":
        return replace(self, signal=signal)

    def add_mask(
        self, probes: DataFrame, mask_name: str, sample: str | None = None
    ) -> "MethylSession":
        masks = self.masks
        if masks is None:
            masks = mask_ops.empty_masks(self.spark)
        return replace(self, masks=mask_ops.add_mask(masks, probes, mask_name, sample))

    def masked_signal(self) -> DataFrame:
        if self.masks is None:
            return self.signal
        return mask_ops.apply_mask_nullout(self.signal, self.masks)

    # -- betas ------------------------------------------------------------
    def betas(
        self, include_out_of_band: bool = False, apply_mask: bool = True
    ) -> DataFrame:
        """Long betas table (sample, probe_id, beta) — reference
        ``calculate_betas`` samples.py:1074-1108 + ``get_betas`` 1129-1198."""
        src = self.masked_signal() if apply_mask else self.signal
        meth, unmeth = meth_unmeth_exprs(include_out_of_band)
        return src.select(
            "sample",
            "probe_id",
            "type",
            "channel",
            "probe_type",
            beta_expr(meth, unmeth).alias("beta"),
        )

    def persist(self) -> "MethylSession":
        """Mark the signal as a reuse point (replaces the reference's manual
        ``sigdf=`` threading, samples.py:129-136)."""
        return replace(self, signal=self.signal.persist())

    # -- canonical preprocessing chain ------------------------------------
    def preprocess(
        self,
        infer_channel: bool = True,
        dye_bias: str | None = "linear",
        noob: bool = True,
        poobah_threshold: float | None = 0.05,
    ) -> "MethylSession":
        """The reference's tutorial-order chain (SURVEY §3.2):
        ``infer_type1_channel -> dye bias -> NOOB -> pOOBAH`` as one call,
        returning a new session whose signal is **persisted** — the chain's
        output is the canonical reuse point consumed by both ``betas()`` and
        downstream DM/CNV, and without the cache every consumer re-runs the
        whole lineage (measured 4x slower at 6M rows,
        tests/test_scale_pipeline.py). ``dye_bias``: 'linear' | 'nl' | None.
        pOOBAH failures (p >= threshold) land in the masks table.
        """
        from pylluminator_spark import preprocessing as pp

        sess = self
        sig = sess.signal
        if infer_channel:
            sig, _summary, _failed = pp.infer_type1_channel(sig)
        if dye_bias == "linear":
            sig = pp.dye_bias_correction(sig)
        elif dye_bias == "nl":
            sig = pp.dye_bias_correction_nl(sig)
        elif dye_bias is not None:
            raise ValueError(f"dye_bias must be 'linear', 'nl' or None: {dye_bias!r}")
        if noob:
            sig = pp.noob_background_correction(sig, sess.masks)
        sig = sig.persist()
        sess = replace(sess, signal=sig)
        if poobah_threshold is not None:
            _pvals, pb_mask = pp.poobah(
                sig, sess.masks, threshold=poobah_threshold
            )
            masks = sess.masks
            if masks is None:
                masks = mask_ops.empty_masks(self.spark)
            sess = replace(sess, masks=masks.unionByName(pb_mask))
        return sess

    # -- persistence (reference pickle save/load utils.py:144-183,
    #    samples.py:445-462 — here: parquet per table + a JSON manifest) ---
    _TABLES = ("signal", "sample_sheet", "manifest", "masks")

    def save(self, path: str) -> None:
        """Persist every table as parquet under ``path`` plus a small JSON
        state manifest — the distributed replacement for whole-object
        pickling (survives engine upgrades, readable by any parquet tool)."""
        import json
        import os

        state = {
            "min_beads": self.min_beads,
            "array_type": self.array_type,
            "tables": [],
        }
        for name in self._TABLES:
            df = getattr(self, name)
            if df is not None:
                df.write.mode("overwrite").parquet(f"{path}/{name}.parquet")
                state["tables"].append(name)
        os.makedirs(path, exist_ok=True)
        with open(f"{path}/session.json", "w") as fh:
            json.dump(state, fh)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "MethylSession":
        import json

        with open(f"{path}/session.json") as fh:
            state = json.load(fh)
        kwargs = {
            name: spark.read.parquet(f"{path}/{name}.parquet")
            for name in state["tables"]
        }
        return cls(
            spark=spark,
            min_beads=state["min_beads"],
            array_type=state.get("array_type"),
            **kwargs,
        )
