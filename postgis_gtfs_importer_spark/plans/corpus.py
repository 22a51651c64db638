"""End-to-end corpus curation: the operator families composed into one
pipeline, the way a production pretraining-data run chains them.

The reference's pipeline shape is download -> clean -> derive -> publish
(plans/pipeline.py keeps that parity surface); this is the corpus
analog: dedup -> decontaminate -> quality-filter -> rebalance -> split
-> pack. Every stage is one of the already-oracle-checked operators —
this module adds the COMPOSITION: stage ordering, the inter-stage
contracts, and a per-stage accounting report (what production actually
debugs with, since "we lost 40% of tokens" must be attributable to a
stage).

Ordering rationale (each stage shrinks or stabilizes the input of the
next, cheapest-first within constraints):
  1. exact dedup first — hash-keyed, cheapest, removes byte-identical
     mass so near-dup never pays for it;
  2. MinHash near-dup on the survivors (LSH-banded, the only all-to-all
     stage, so it runs on the smallest possible input);
  3. benchmark decontamination (broadcast index; must run before
     quality/mixture so leaked eval docs can't influence corpus stats);
  4. quality + language gate (pure column predicates, zero shuffle);
  5. balanced mixture over the stratum column (data-derived thresholds,
     broadcast back);
  6. deterministic split assignment (pure expression — LAST, so every
     upstream drop applies to all splits identically and re-runs never
     migrate a doc between splits);
  7. sequence packing per split (shard-parallel layout).

All decisions are content-hash-deterministic, so the whole pipeline is
idempotent: re-running on the same corpus yields byte-identical outputs
(pinned by tests/test_corpus_pipeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.curation import (
    assign_split,
    balanced_mixture,
    decontaminate,
    pack_sequences,
)
from ..operators.dedup import dedup_exact, minhash_dedup


@dataclass
class CorpusConfig:
    id_col: str = "doc_id"
    text_col: str = "text"
    stratum_col: str = "lang"
    near_dup_threshold: float = 0.5
    #: decontamination n-gram length. The operator's own default is the
    #: published 13-gram rule; the pipeline keeps 5 (the pre-r9 pipeline
    #: contract) because the synthetic fixtures top out near 5-gram
    #: overlap — production corpora should raise it to 13.
    decontaminate_n: int = 5
    #: decontamination drop threshold (contam_ppm above this drops);
    #: 0 = any contaminated token drops, the Brown et al. rule.
    decontaminate_drop_ppm: int = 0
    min_quality_e6: int = 300_000  # quality_score * 1e6 gate
    allowed_langs: tuple[str, ...] = ()  # empty = keep all
    #: corpus-trained bigram-LM fluency floor (mean_cond_e6); None = off.
    #: Runs AFTER dedup/decontamination so duplicated boilerplate cannot
    #: inflate its own conditional probabilities in the trained model.
    min_fluency_e6: int | None = None
    #: trigram stupid-backoff fluency floor (mean_sb_e6); None = off.
    #: The model trains on the slice whose 32-bit md5(id-as-string)
    #: prefix is nonzero mod trigram_train_mod and scores ALL gated
    #: survivors, so held-out docs exercise the real backoff chain
    #: (indexing.trigram_backoff_scores — the KenLM-class gate one
    #: order above min_fluency_e6's bigram). Hash-keyed, so any id
    #: type works — string ids included.
    min_trigram_sb_e6: int | None = None
    trigram_train_mod: int = 3
    #: relative per-stratum keep fraction (num, den); None = off. Runs
    #: after the absolute gates — percentiles re-normalize what survives.
    percentile_keep: tuple[int, int] | None = None
    #: drop docs MORE compressible than this (ratio_e6 floor — low ratio
    #: = boilerplate/repetition); None = off.
    min_compression_ratio_e6: int | None = None
    #: DSIR domain-match resampling (Xie et al. 2023): keep the dsir_k
    #: surviving docs most like the ``dsir_target`` corpus passed to
    #: curate_corpus; None = off. Runs AFTER the absolute gates (weights
    #: should rank what quality already admitted) and BEFORE the
    #: mixture (resampling changes stratum masses the mixture then
    #: re-balances).
    dsir_k: int | None = None
    dsir_buckets: int = 1024
    balance_mixture: bool = True
    split_weights: dict[str, float] = field(
        default_factory=lambda: {"train": 0.98, "val": 0.01, "test": 0.01}
    )
    pack_capacity: int = 2048
    pack_shards: int = 16
    salt: str = "corpus"


@dataclass
class CorpusResult:
    """Final per-split packed layout plus the per-stage accounting."""

    curated: DataFrame  # (id, stratum, split) after all gates
    packed: DataFrame  # pack_sequences output + split column
    report: dict[str, int]  # stage -> surviving doc count


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    cfg: CorpusConfig | None = None,
    dsir_target: DataFrame | None = None,
) -> CorpusResult:
    """Run the full curation chain; see module docstring for ordering.

    ``docs`` needs (id_col, text_col, stratum_col). ``benchmark`` (same
    id/text columns) enables stage 3. Counts in the report are actions —
    the stage frames are small projections, so counting them per stage
    costs one job each over the already-pruned lineage; at production
    scale you persist stage boundaries instead (sinks/staging.py).
    """
    c = cfg or CorpusConfig()
    report: dict[str, int] = {"input": docs.count()}

    # 1. exact dedup (canonical = min id, survivors only)
    exact, _ = dedup_exact(docs, c.id_col, [c.text_col])
    report["exact_dedup"] = exact.count()

    # 2. near-dup dedup (MinHash LSH + connected components)
    near = minhash_dedup(
        exact, c.id_col, c.text_col, threshold=c.near_dup_threshold
    )
    report["near_dedup"] = near.count()

    # 3. benchmark decontamination
    if benchmark is not None:
        flagged = (
            decontaminate(
                near, benchmark, id_col=c.id_col, text_col=c.text_col,
                n=c.decontaminate_n, drop_ppm=c.decontaminate_drop_ppm,
            )
            .filter(F.col("drop_doc"))
            .select(c.id_col)
        )
        clean = near.join(flagged, c.id_col, "left_anti")
    else:
        clean = near
    report["decontaminated"] = clean.count()

    # 4. quality + language gate (pure column predicates). The score is
    # CARRIED as a column so the 4c percentile gate can reuse it —
    # quality_score expands to several regexp full-text scans per row,
    # and recomputing it over the survivors paid that pass twice.
    gated = clean.withColumn(
        "_q", F.floor(TX.quality_score(F.col(c.text_col)) * 1e6 + 0.5)
    ).filter(F.col("_q") >= c.min_quality_e6)
    if c.allowed_langs:
        gated = gated.filter(
            TX.lang_id(F.col(c.text_col)).isin(list(c.allowed_langs))
        )
    report["quality_gated"] = gated.count()

    # 4b. bigram-LM fluency floor (model trained on the gated survivors —
    # post-dedup, so boilerplate repetition can't inflate its own
    # probabilities; transcendental-free, see indexing.bigram_lm_scores)
    if c.min_fluency_e6 is not None:
        from ..operators.indexing import bigram_lm_scores

        # LEFT join + pass-when-unscored: bigram_lm_scores emits a row
        # only for docs with >= 1 bigram, so a semi-join silently
        # dropped every 0/1-token doc REGARDLESS of the threshold (and
        # the report blamed "fluency"). A doc too short to score has
        # no evidence against it — it passes this gate and faces the
        # others.
        scores = bigram_lm_scores(
            gated, id_col=c.id_col, text_col=c.text_col
        ).select(c.id_col, "mean_cond_e6")
        gated = (
            gated.join(scores, c.id_col, "left")
            .filter(
                F.col("mean_cond_e6").isNull()
                | (F.col("mean_cond_e6") >= c.min_fluency_e6)
            )
            .drop("mean_cond_e6")
        )
        report["fluency_gated"] = gated.count()

    # 4b1b. trigram stupid-backoff fluency floor — the bigram gate one
    # order up, with a REAL held-out split (the self-trained bigram
    # model can never see an unseen n-gram; here the held-out slice
    # scores against a model that has never read it). The split keys
    # on a 32-bit md5 prefix of the STRINGIFIED id (hash % mod == 0
    # is held out), so it is id-TYPE agnostic — the r10 form
    # (`id % mod`) crashed at analysis time on string ids, unlike
    # every other gate (ADVICE r10). Same LEFT join +
    # pass-when-unscored discipline: a doc with < 3 tokens has no
    # trigram and no evidence against it.
    if c.min_trigram_sb_e6 is not None:
        from ..operators.indexing import trigram_backoff_scores

        _id_hash = F.conv(
            F.substring(F.md5(F.col(c.id_col).cast("string")), 1, 8),
            16, 10,
        ).cast("bigint")
        t_scores = trigram_backoff_scores(
            gated,
            gated.filter(_id_hash % int(c.trigram_train_mod) != 0),
            id_col=c.id_col,
            text_col=c.text_col,
        ).select(c.id_col, "mean_sb_e6")
        gated = (
            gated.join(t_scores, c.id_col, "left")
            .filter(
                F.col("mean_sb_e6").isNull()
                | (F.col("mean_sb_e6") >= c.min_trigram_sb_e6)
            )
            .drop("mean_sb_e6")
        )
        report["trigram_fluency_gated"] = gated.count()

    # 4b2. compression-ratio floor (repetitiveness: boilerplate DEFLATEs
    # far below prose — the zlib twin of the LM gate)
    if c.min_compression_ratio_e6 is not None:
        from ..operators.scoring import compression_ratio

        incompressible = (
            compression_ratio(gated, id_col=c.id_col, text_col=c.text_col)
            .filter(F.col("ratio_e6") >= c.min_compression_ratio_e6)
            .select(c.id_col)
        )
        gated = gated.join(incompressible, c.id_col, "left_semi")
        report["compression_gated"] = gated.count()

    # 4c. relative percentile gate per stratum (after the absolute
    # gates: percentiles re-normalize quality across what survives)
    if c.percentile_keep is not None:
        from ..operators.curation import percentile_gate

        num, den = c.percentile_keep
        gated = percentile_gate(
            gated, score_col="_q", stratum_col=c.stratum_col,
            id_col=c.id_col, keep_num=num, keep_den=den,
        ).drop("rank", "stratum_size")
        report["percentile_gated"] = gated.count()

    gated = gated.drop("_q")  # internal carry column, not an output

    # 4d. DSIR domain-match resampling (flag-gated): keep the dsir_k
    # docs most like the target domain by hashed-n-gram importance
    # weights — after the absolute gates, before the mixture.
    if c.dsir_k is not None and dsir_target is not None:
        from ..operators.curation import dsir_resample

        picked = dsir_resample(
            gated, dsir_target, k=c.dsir_k, id_col=c.id_col,
            text_col=c.text_col, buckets=c.dsir_buckets,
            salt=c.salt + "-dsir",
        ).select(c.id_col)
        gated = gated.join(picked, c.id_col, "left_semi")
        report["dsir_resampled"] = gated.count()

    # 5. balanced mixture over the stratum
    if c.balance_mixture:
        mixed = balanced_mixture(
            gated, key_col=c.id_col, stratum_col=c.stratum_col,
            salt=c.salt + "-mix",
        )
    else:
        mixed = gated
    report["mixed"] = mixed.count()

    # 6. split assignment (pure expression, content-addressed)
    curated = mixed.withColumn(
        "split", assign_split(c.id_col, c.split_weights, salt=c.salt)
    )

    # 7. pack per split (split participates in the shard key, so packing
    # one split never reads another's rows)
    sized = curated.select(
        c.id_col,
        c.stratum_col,
        "split",
        TX.token_count(F.col(c.text_col)).alias("n_tokens"),
    )
    packs = []
    for split in c.split_weights:
        part = sized.filter(F.col("split") == split)
        packs.append(
            pack_sequences(
                part.select(c.id_col, "n_tokens"),
                id_col=c.id_col,
                tokens_col="n_tokens",
                capacity=c.pack_capacity,
                n_shards=c.pack_shards,
                salt=c.salt + "-pack-" + split,
            ).withColumn("split", F.lit(split))
        )
    packed = packs[0]
    for p in packs[1:]:
        packed = packed.unionByName(p)
    report["packed_docs"] = packed.count()

    return CorpusResult(
        curated=curated.select(c.id_col, c.stratum_col, "split"),
        packed=packed,
        report=report,
    )
