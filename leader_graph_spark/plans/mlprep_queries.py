"""Training-data preparation queries: sequence packing and
deterministic stratified sampling over the ``documents`` table.

Registered AFTER the core modules (see ``plans/__init__``) so the
round-2 sweep window stays reserved for queries still awaiting a
driver verdict; these get their rows in the following sweep (they pass
the identical local replay in ``tests/test_parity.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from leader_graph_spark.operators.packing import pack_by_cumsum, pack_greedy_partitions
from leader_graph_spark.operators.sampling import stratified_sample_exact
from leader_graph_spark.plans.registry import query
from leader_graph_spark.sources.tables import fan_out, load_table

_PACK_BUDGET = 50_000  # chars per pack; n_chars is the token proxy

_PACKS_ORACLE = f"""
WITH c AS (
  SELECT doc_id, n_chars,
         COALESCE(sum(n_chars) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(before // {_PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(before % {_PACK_BUDGET} AS BIGINT) AS pack_offset
FROM c
"""


@query("token_budget_packs", _PACKS_ORACLE, tags=("packing", "mlprep"))
def token_budget_packs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: documents in doc_id order assigned
    to fixed-token-budget packs via one prefix-sum window
    (pack_id = tokens_before // budget). The straddle form — a pack may
    overshoot by at most one document — which is what keeps it a single
    sort + window at 100 TB; the exact no-overflow variant is
    ``pack_greedy_partitions`` (rows-only check)."""
    docs = fan_out(load_table(spark, sf_dir, "documents")).select("doc_id", "n_chars")
    return pack_by_cumsum(
        docs, id_col="doc_id", token_col="n_chars", budget=_PACK_BUDGET
    )


def _hex8_instr(expr: str) -> str:
    """DuckDB arithmetic for int(first-8-hex-chars of md5(expr), 16) —
    the same portable hex parse the checksum oracles use."""
    terms = [
        f"(instr('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


# repr(('<lang>',)) exactly as Python renders the applyInPandas group
# key tuple — the md5 input for the collision-free pack-id base.
_KEY_REPR = "'(''' || lang || ''',)'"

_GREEDY_ORACLE = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
), s AS (
  SELECT doc_id, lang, n_chars, rn,
         CAST(0 AS BIGINT) AS pack_local, n_chars AS used
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.doc_id, d.lang, d.n_chars, d.rn,
         CASE WHEN s.used + d.n_chars > {_PACK_BUDGET}
              THEN s.pack_local + 1 ELSE s.pack_local END,
         CASE WHEN s.used + d.n_chars > {_PACK_BUDGET}
              THEN d.n_chars ELSE s.used + d.n_chars END
  FROM s JOIN d ON d.lang = s.lang AND d.rn = s.rn + 1
)
SELECT doc_id, lang, n_chars,
       CAST(({_hex8_instr(_KEY_REPR)} % 2147483648) * 4294967296
            + pack_local AS BIGINT) AS pack_id,
       CAST(used AS BIGINT) AS pack_tokens
FROM s
"""


@query("greedy_packs_no_overflow", _GREEDY_ORACLE, tags=("packing", "mlprep"))
def greedy_packs_no_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact next-fit packing per language partition (applyInPandas):
    documents stream in id order, a pack closes when the next document
    would overflow the budget — no pack exceeds it unless a single
    document alone does (invariant asserted in tests/test_operators.py).
    Fully oracle-checked: the per-group sequential state is a recursive
    CTE stepping rn→rn+1, and the md5-prefix pack-id base is the
    instr-arithmetic hex parse, so pack ids match bit-for-bit."""
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "n_chars"
    )
    return pack_greedy_partitions(
        docs, id_col="doc_id", token_col="n_chars", budget=_PACK_BUDGET,
        partition_col="lang",
    )


_STRATIFIED_ORACLE = """
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('sample|' || CAST(doc_id AS VARCHAR)), doc_id) AS _rk,
         count(*) OVER (PARTITION BY lang) AS _n
  FROM documents
)
SELECT doc_id, lang, n_chars FROM ranked WHERE _rk <= ceil(_n * 0.1)
"""


@query("stratified_doc_sample", _STRATIFIED_ORACLE, tags=("sampling", "mlprep"))
def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10%-per-language sample chosen by md5 rank — deterministic
    across engines, partitionings and row orders (``df.sample`` is
    none of these), with every stratum hitting its quota exactly.
    One shuffle on the stratum key."""
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "n_chars"
    )
    return stratified_sample_exact(
        docs, strata_col="lang", key_col="doc_id", fraction=0.1
    )


def _hash_bucket_sql(key_expr: str, salt: str) -> str:
    """DuckDB twin of ``operators.sampling._hash_bucket``: the leading
    8 md5 hex chars as an integer, mod 1e6 (DuckDB has no ``conv``;
    instr arithmetic digit by digit, value equality verified)."""
    md5 = f"md5('{salt}|' || {key_expr})"
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr({md5}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({terms}) % 1000000)"


_MIXTURE_ORACLE = f"""
WITH counts AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY lang),
tot AS (SELECT sum(n_s) AS n FROM counts),
factors AS (SELECT lang, 0.2 * n / n_s AS factor FROM counts, tot)
SELECT d.doc_id AS key, d.lang AS stratum,
       round(f.factor, 6) AS mix_factor,
       CAST(floor(f.factor)
            + CASE WHEN {_hash_bucket_sql("CAST(d.doc_id AS VARCHAR)", "mix")}
                        < floor((f.factor - floor(f.factor)) * 1000000)
                   THEN 1 ELSE 0 END AS INT) AS n_copies
FROM documents d JOIN factors f USING (lang)
"""


@query("mixture_resample_by_lang", _MIXTURE_ORACLE, tags=("sampling", "mixing", "mlprep"))
def mixture_resample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture resampling toward an equal 20% share per
    language: over-represented languages hash-downsample, minority ones
    repeat (integer epochs + fractional hash-accepted copy), all
    deterministic from md5(doc_id). The per-language factor table is a
    broadcast of five rows; the copy decision is map-side."""
    from leader_graph_spark.operators.sampling import mixture_resample

    docs = load_table(spark, sf_dir, "documents")
    return mixture_resample(
        fan_out(docs),
        stratum_col="lang",
        key_col="doc_id",
        target_shares={k: 0.2 for k in ("en", "de", "es", "fr", "zh")},
    )


_MIX_REPORT_ORACLE = """
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST((SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) AS BIGINT) AS global_chars,
       CAST(floor(1000000.0 * CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)
             / CAST((SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) AS DOUBLE)) AS BIGINT) AS char_share_ppm
FROM documents
GROUP BY lang, source
"""


@query("corpus_mixture_report", _MIX_REPORT_ORACLE, tags=("mixing", "mlprep", "A1"))
def corpus_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-design input report: per (lang, source) document counts,
    character totals and each cell's share of the global character
    budget — what a training-data pipeline reads before setting
    resampling targets (``mixture_resample_by_lang`` consumes shares
    like these). One map-side-combinable groupBy; the global total
    joins back as a broadcast scalar, so the report never reshuffles
    the corpus. The share is emitted in exact form: the BIGINT global
    total rides along, and char_share_ppm = floor(1e6·a/b) — floor over
    the bit-identical IEEE double quotient is engine-agnostic, unlike
    round() whose tie handling differs (Spark HALF_UP vs DuckDB
    half-to-even on doubles)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("lang", "source", "n_chars")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    # Window over the ~|langs|x|sources| aggregate (tiny), not the corpus.
    total = F.sum("total_chars").over(Window.partitionBy())
    return cells.select(
        "lang",
        "source",
        "n_docs",
        "total_chars",
        total.alias("global_chars"),
        F.floor(
            F.lit(1000000.0) * F.col("total_chars").cast("double") / total.cast("double")
        ).alias("char_share_ppm"),
    )


def _weighted_sample_oracle() -> str:
    bucket = _hash_bucket_sql("CAST(doc_id AS VARCHAR)", "wsample")
    return f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         -ln(({bucket} + 0.5) / 1000000.0) / n_chars AS aes
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, lang, n_chars, CAST(rk AS INT) AS rk
FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY aes, doc_id) AS rk
  FROM keyed
)
WHERE rk <= 10
"""


@query(
    "weighted_doc_sample",
    _weighted_sample_oracle(),
    tags=("sampling", "weighted", "mlprep"),
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 documents per language sampled WITHOUT replacement with
    probability proportional to length (Efraimidis–Spirakis exponential
    keys over the md5-uniform, ``operators/sampling.py:
    weighted_sample_topk``) — the quality-weighted subset draw of a
    curation pipeline ("sample a review set, favoring long docs"),
    reproducible under any engine or partitioning. The oracle replays
    the exact key arithmetic, so the sampler's determinism claim is
    value-checked, not asserted."""
    from leader_graph_spark.operators.sampling import weighted_sample_topk

    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "n_chars"
    )
    return weighted_sample_topk(
        docs, strata_col="lang", key_col="doc_id", weight_col="n_chars", k=10
    )


def _release_manifest_oracle() -> str:
    from leader_graph_spark.plans.text_queries import _curation_oracle

    bucket = _hash_bucket_sql("CAST(doc_id AS VARCHAR)", "release")
    return f"""
WITH curation AS ({_curation_oracle()}),
kept AS (SELECT doc_id, n_tokens FROM curation WHERE keep),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM kept
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(before // 1000 AS BIGINT) AS pack_id,
       CAST(before % 1000 AS BIGINT) AS pack_offset,
       CASE WHEN {bucket} < 900000 THEN 'train' ELSE 'val' END AS split
FROM c
"""


@query(
    "corpus_release_manifest",
    _release_manifest_oracle(),
    bench=True,
    tags=("curation", "packing", "mlprep", "composite", "capstone"),
)
def corpus_release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CAPSTONE composition: a dataset-release manifest produced by
    chaining three already-verified stages end-to-end — curation
    verdicts (exact-dup election + span gate + length/punct gates) →
    keep-set → distributed prefix-sum packing into 1,000-token budgets
    → deterministic 90/10 train/val split — the artifact a training
    run actually consumes ("which doc, which pack, what offset, which
    split"), with the WHOLE chain under one value hash so the stages
    are proven to compose, not just to pass individually.

    Scale shape: inherits each stage's plan — the curation signals are
    doc-keyed, the packing prefix-sum is the two-phase range-partition
    form (never a single-reducer global window), and the split is
    map-side md5 arithmetic. Nothing in the composition adds a shuffle
    beyond the stages' own."""
    from leader_graph_spark.operators.packing import pack_by_cumsum
    from leader_graph_spark.operators.sampling import _hash_bucket
    from leader_graph_spark.plans.text_queries import corpus_curation_verdicts

    verdicts = corpus_curation_verdicts(spark, sf_dir)
    kept = verdicts.where(F.col("keep")).select(
        "doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens")
    )
    packed = pack_by_cumsum(kept, id_col="doc_id", token_col="n_tokens", budget=1000)
    return packed.select(
        "doc_id",
        "n_tokens",
        F.col("pack_id").cast("bigint").alias("pack_id"),
        F.col("pack_offset").cast("bigint").alias("pack_offset"),
        F.when(_hash_bucket("doc_id", "release") < 900000, "train")
        .otherwise("val")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Length-bucketed batching + padding economics (dynamic-batching prep)
# ---------------------------------------------------------------------------

_BUCKET_W, _BATCH_N = 64, 8

_PADDING_ORACLE = f"""
WITH assigned AS (
  SELECT n_chars,
         n_chars // {_BUCKET_W} AS length_bucket,
         (row_number() OVER (PARTITION BY n_chars // {_BUCKET_W}
                             ORDER BY n_chars, doc_id) - 1) // {_BATCH_N} AS batch_idx
  FROM documents
), per_batch AS (
  SELECT length_bucket, batch_idx,
         count(*) AS n_rows, max(n_chars) AS mx, sum(n_chars) AS tok
  FROM assigned GROUP BY length_bucket, batch_idx
)
SELECT length_bucket,
       CAST(sum(n_rows) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_batches,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       CAST(sum(mx * n_rows) AS BIGINT) AS padded_cells,
       CAST((1000000 * (sum(mx * n_rows) - sum(tok))) // sum(mx * n_rows) AS BIGINT)
         AS waste_ppm
FROM per_batch GROUP BY length_bucket
"""


@query("length_bucket_padding_report", _PADDING_ORACLE, tags=("packing", "mlprep", "W2"))
def length_bucket_padding_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-batching prep (`operators/packing.py:
    length_bucketed_batches`): documents grouped into 64-char length
    buckets, batched 8 at a time within each bucket in (length, id)
    order, and the padding a loader would spend (pad-to-batch-max)
    reported per bucket as exact integers — waste in ppm via floor
    division so parity never rests on float rounding. One hash
    exchange by bucket serves the assignment window AND both
    aggregations (bucket partitioning co-locates (bucket, batch));
    fixed bucket width turns length skew into more buckets, not a
    bigger partition."""
    from leader_graph_spark.operators.packing import (
        length_bucketed_batches,
        padding_report,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents")).select("doc_id", "n_chars")
    batches = length_bucketed_batches(
        docs,
        id_col="doc_id",
        token_col="n_chars",
        bucket_width=_BUCKET_W,
        batch_size=_BATCH_N,
    )
    return padding_report(batches, token_col="n_chars")


# ---------------------------------------------------------------------------
# Token-balanced shard striping (data-parallel training shards)
# ---------------------------------------------------------------------------

_N_SHARDS = 8

_SHARD_ORACLE = f"""
WITH ranked AS (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS r
  FROM documents
)
SELECT CAST(CASE WHEN (r // {_N_SHARDS}) % 2 = 0
            THEN r % {_N_SHARDS}
            ELSE {_N_SHARDS - 1} - (r % {_N_SHARDS}) END AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_tokens
FROM ranked GROUP BY 1
"""


@query("balanced_shard_report", _SHARD_ORACLE, tags=("packing", "mlprep", "skew"))
def balanced_shard_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment (`operators/packing.py:
    striped_shard_assignment`): documents dealt serpentine-order onto 8
    shards from a (tokens DESC, id) global rank, reported as per-shard
    doc and token totals. The rank is the two-phase range-partitioned
    form (no single-reducer window); the oracle replays rank → shard →
    totals in plain SQL, so the whole assignment — not just the
    counts — is value-checked. Balance itself is asserted in
    test_operators (shard token spread ≤ one max-sized document,
    versus the ~spread×n_docs/n a hash split allows)."""
    from leader_graph_spark.operators.packing import striped_shard_assignment

    docs = fan_out(load_table(spark, sf_dir, "documents")).select("doc_id", "n_chars")
    assigned = striped_shard_assignment(
        docs, id_col="doc_id", token_col="n_chars", n_shards=_N_SHARDS
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_tokens"),
    )


_DOMAIN_CAP = 10

_DOMAIN_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_hash_bucket_sql("CAST(doc_id AS VARCHAR)", "domain-cap")}, doc_id
         ) AS domain_rank
  FROM documents
)
SELECT doc_id, source, CAST(domain_rank AS INT) AS domain_rank
FROM ranked WHERE domain_rank <= {_DOMAIN_CAP}
"""


@query("domain_capped_docs", _DOMAIN_CAP_ORACLE, tags=("sampling", "mlprep", "anti-domination"))
def domain_capped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap (round-5): at most {cap} docs per
    ``source``, chosen by deterministic md5-hash rank — the
    anti-domination pass that keeps one crawl-heavy domain from owning
    the training mix. One shuffle on the domain key; survivors stable
    under repartitioning (hash order, not arrival order)."""
    from leader_graph_spark.operators.sampling import domain_capped_sample

    docs = fan_out(load_table(spark, sf_dir, "documents")).select("doc_id", "source")
    return domain_capped_sample(
        docs, domain_col="source", key_col="doc_id", max_per_domain=_DOMAIN_CAP
    ).select("doc_id", "source", F.col("domain_rank").cast("int").alias("domain_rank"))


_DSIR_BUCKETS = 256


def _dsir_bucket_sql(tok_expr: str) -> str:
    md5 = f"md5('dsir|' || {tok_expr})"
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr({md5}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({terms}) % {_DSIR_BUCKETS})"


_DSIR_ORACLE = f"""
WITH toks0 AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
toks AS (
  SELECT doc_id, lang, {_dsir_bucket_sql("tok")} AS bucket
  FROM toks0 WHERE tok <> ''
),
raw_counts AS (SELECT bucket, count(*) AS raw_n FROM toks GROUP BY 1),
tgt_counts AS (SELECT bucket, count(*) AS tgt_n FROM toks WHERE lang = 'en' GROUP BY 1),
lut AS (
  SELECT r.bucket,
         (length(bin(COALESCE(t.tgt_n, 0) + 1)) - 1)
         - (length(bin(r.raw_n + 1)) - 1) AS bucket_score
  FROM raw_counts r LEFT JOIN tgt_counts t USING (bucket)
)
SELECT k.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(l.bucket_score) AS BIGINT) AS dsir_score
FROM toks k JOIN lut l USING (bucket)
GROUP BY k.doc_id
"""


@query("dsir_importance_scores", _DSIR_ORACLE, tags=("sampling", "mlprep", "dsir"))
def dsir_importance_scores_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores (Xie et al. 2023), integer-exact variant
    (round-5): hashed-unigram log-likelihood ratio of an ``en``-target
    corpus vs the raw corpus, with the log as the repo's bit-length
    integer approximation (no libm ulp risk, bit-reproducible in both
    engines). Both count tables collapse to ≤ {buckets} rows and
    broadcast; the corpus shuffles only for the per-doc combine."""
    from leader_graph_spark.operators.sampling import dsir_importance_scores

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # r11: the target is a predicate on the same corpus — the fused
    # count pass drops one full tokenize+md5 pass (guide §1.2 step 2).
    return dsir_importance_scores(
        docs,
        key_col="doc_id",
        text_col="text",
        n_buckets=_DSIR_BUCKETS,
        target_filter=F.col("lang") == "en",
    )


_MIX_CAP = 15
_MIX_KEEP_DECILE = 6

_MIX_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source, text,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_hash_bucket_sql("CAST(doc_id AS VARCHAR)", "domain-cap")}, doc_id
         ) AS domain_rank
  FROM documents
),
capped AS (SELECT doc_id, source, text FROM ranked WHERE domain_rank <= {_MIX_CAP}),
toks0 AS (
  SELECT c.doc_id, d.lang,
         unnest(string_split_regex(trim(lower(c.text)), '\\s+')) AS tok
  FROM capped c JOIN documents d USING (doc_id)
),
toks AS (
  SELECT doc_id, lang, {_dsir_bucket_sql("tok")} AS bucket
  FROM toks0 WHERE tok <> ''
),
raw_counts AS (SELECT bucket, count(*) AS raw_n FROM toks GROUP BY 1),
tgt_counts AS (SELECT bucket, count(*) AS tgt_n FROM toks WHERE lang = 'en' GROUP BY 1),
lut AS (
  SELECT r.bucket,
         (length(bin(COALESCE(t.tgt_n, 0) + 1)) - 1)
         - (length(bin(r.raw_n + 1)) - 1) AS bucket_score
  FROM raw_counts r LEFT JOIN tgt_counts t USING (bucket)
),
scores AS (
  SELECT k.doc_id, CAST(sum(l.bucket_score) AS BIGINT) AS dsir_score
  FROM toks k JOIN lut l USING (bucket) GROUP BY 1
),
deciled AS (
  SELECT s.doc_id, c.source, s.dsir_score,
         CAST(ntile(10) OVER (ORDER BY s.dsir_score, s.doc_id) AS INT) AS score_decile
  FROM scores s JOIN capped c USING (doc_id)
)
SELECT doc_id, source, dsir_score, score_decile
FROM deciled WHERE score_decile >= {_MIX_KEEP_DECILE}
"""


@query("curated_pretrain_mix", _MIX_ORACLE, bench=True, tags=("mlprep", "capstone", "dsir"))
def curated_pretrain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 curation capstone: the new curation stages COMPOSED
    under one value hash — per-domain cap (anti-domination) → DSIR
    importance scores against the ``en`` target computed over the
    CAPPED corpus (selection statistics must reflect what survives
    upstream, not the raw crawl) → exact decile rank-normalization via
    the two-phase distributed ntile → keep the top half. Like
    ``corpus_release_manifest``, the shuffle budget is the sum of the
    stages' own (cap window + token combine + rank passes); the
    composition adds nothing."""
    from leader_graph_spark.operators.sampling import (
        domain_capped_sample,
        dsir_importance_scores,
    )
    from leader_graph_spark.plans.analytics_queries import _distributed_ntile

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # Materialize the capped corpus once (r10): three consumers below
    # (raw-count pass, en-target pass, final source join) each re-ran
    # the domain-cap window over the full text column when left lazy.
    capped = domain_capped_sample(
        docs.select("doc_id", "source", "text", "lang"),
        domain_col="source",
        key_col="doc_id",
        max_per_domain=_MIX_CAP,
    ).drop("domain_rank").localCheckpoint()
    scores = dsir_importance_scores(
        capped,
        key_col="doc_id",
        text_col="text",
        target_filter=F.col("lang") == "en",
    ).select("doc_id", "dsir_score")
    scored = scores.join(capped.select("doc_id", "source"), "doc_id")
    deciled = _distributed_ntile(
        scored, [F.asc("dsir_score"), F.asc("doc_id")], "score_decile", k=10
    )
    return deciled.where(F.col("score_decile") >= _MIX_KEEP_DECILE).select(
        "doc_id", "source", "dsir_score", "score_decile"
    )


# ---------------------------------------------------------------------------
# Probabilistic record linkage (Fellegi-Sunter) over a deterministic
# dirty twin of the customer table. The twin perturbs each
# quasi-identifier on its own residue lane so every verdict class and
# every agreement combination occurs: k%13 breaks the BLOCKING phone
# (those pairs are lost by design — blocking is a recall decision and
# the oracle prices it), k%7 dirties the name, k%5 the segment, k%11
# the nation. Integer milli-weights keep the score exact bigint.
# ---------------------------------------------------------------------------

_FS_WEIGHTS = {"name": (2800, -1200), "segment": (700, -900), "nation": (1100, -1500)}
_FS_MATCH, _FS_POSSIBLE = 2500, 0

_FS_SCORE_SQL = """CAST(CASE WHEN a.name = b.name THEN 2800 ELSE -1200 END
          + CASE WHEN a.segment = b.segment THEN 700 ELSE -900 END
          + CASE WHEN a.nation = b.nation THEN 1100 ELSE -1500 END AS BIGINT)"""

_RECORD_LINKAGE_ORACLE = f"""
WITH a AS (
  SELECT c_custkey AS k, c_name AS name, c_mktsegment AS segment,
         c_nationkey AS nation, md5(CAST(c_custkey AS VARCHAR)) AS phone
  FROM customer
),
b AS (
  SELECT c_custkey AS k,
         CASE WHEN c_custkey % 7 = 0 THEN c_name || ' jr' ELSE c_name END AS name,
         CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS segment,
         CASE WHEN c_custkey % 11 = 0 THEN (c_nationkey + 7) % 25 ELSE c_nationkey END AS nation,
         CASE WHEN c_custkey % 13 = 0 THEN md5(CAST(c_custkey AS VARCHAR) || 'moved')
              ELSE md5(CAST(c_custkey AS VARCHAR)) END AS phone
  FROM customer
),
scored AS (
  SELECT a.k AS custkey,
         a.name = b.name AS agree_name,
         a.segment = b.segment AS agree_segment,
         a.nation = b.nation AS agree_nation,
         {_FS_SCORE_SQL} AS score_milli
  FROM a JOIN b ON a.phone = b.phone
)
SELECT custkey, agree_name, agree_segment, agree_nation, score_milli,
       CASE WHEN score_milli >= {_FS_MATCH} THEN 'match'
            WHEN score_milli >= {_FS_POSSIBLE} THEN 'possible'
            ELSE 'non_match' END AS verdict
FROM scored
"""


def _fs_twin_sides(spark: SparkSession, sf_dir: str):
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    a = cust.select(
        k.alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
        F.md5(k.cast("string")).alias("phone"),
    )
    b = cust.select(
        k.alias("k"),
        F.when(k % 7 == 0, F.concat(F.col("c_name"), F.lit(" jr")))
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when(k % 5 == 0, F.lit("UNKNOWN")).otherwise(F.col("c_mktsegment")).alias("segment"),
        F.when(k % 11 == 0, (F.col("c_nationkey") + 7) % 25)
        .otherwise(F.col("c_nationkey"))
        .alias("nation"),
        F.when(k % 13 == 0, F.md5(F.concat(k.cast("string"), F.lit("moved"))))
        .otherwise(F.md5(k.cast("string")))
        .alias("phone"),
    )
    return a, b


@query(
    "record_linkage_customer_twin",
    _RECORD_LINKAGE_ORACLE,
    tags=("linkage", "entity-resolution", "blocking-join"),
)
def record_linkage_customer_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage
    (``operators/linkage.py:fellegi_sunter_link``) between the customer
    table and its deterministic dirty twin: blocking equi-join on the
    synthesized phone (1/13 of twins move phone and are unrecoverable
    by THIS blocking pass — priced by the oracle), null-safe per-field
    agreement on name/segment/nation, integer milli-weight scores, and
    the three-way match / possible / non_match verdict. Every output
    column — the agreement vector, the exact bigint score and the
    verdict — sits under the value hash. Scale shape: one shuffle per
    side on the high-cardinality blocking key, pair count bounded by
    blocking (1:1 here), weights constant-folded, no UDF anywhere."""
    from leader_graph_spark.operators.linkage import fellegi_sunter_link

    a, b = _fs_twin_sides(spark, sf_dir)
    linked = fellegi_sunter_link(
        a,
        b,
        block_on="phone",
        compare={f: (f, f) for f in _FS_WEIGHTS},
        weights=_FS_WEIGHTS,
        match_threshold=_FS_MATCH,
        possible_threshold=_FS_POSSIBLE,
    )
    return linked.select(
        F.col("k_l").alias("custkey"),
        "agree_name",
        "agree_segment",
        "agree_nation",
        "score_milli",
        "verdict",
    )


# ---------------------------------------------------------------------------
# Typo-tolerant linkage: same dirty-twin construction, but the name
# lane plants EDIT-DISTANCE noise instead of a clean suffix — k%7
# substitutes one character (distance 1, inside the band), k%9 appends
# one (distance 1), k%63 gets both (distance 2, OUTSIDE the band) —
# so the levenshtein-banded agreement predicate is exercised on both
# sides of its threshold. Spark's levenshtein and DuckDB's agree 1:1
# on integer edit distance, so banded agreement stays hash-exact.
# ---------------------------------------------------------------------------

_FUZZY_LEV_MAX = 1

_FUZZY_LINKAGE_ORACLE = f"""
WITH a AS (
  SELECT c_custkey AS k, c_name AS name, c_mktsegment AS segment,
         md5(CAST(c_custkey AS VARCHAR)) AS phone
  FROM customer
),
b0 AS (
  SELECT c_custkey AS k,
         CASE WHEN c_custkey % 7 = 0
              THEN substr(c_name, 1, 3) || 'x' || substr(c_name, 5)
              ELSE c_name END AS name,
         CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS segment,
         md5(CAST(c_custkey AS VARCHAR)) AS phone
  FROM customer
),
b AS (
  SELECT k,
         CASE WHEN k % 9 = 0 THEN name || 'x' ELSE name END AS name,
         segment, phone
  FROM b0
),
scored AS (
  SELECT a.k AS custkey,
         levenshtein(a.name, b.name) <= {_FUZZY_LEV_MAX} AS agree_name,
         a.segment = b.segment AS agree_segment,
         CAST(CASE WHEN levenshtein(a.name, b.name) <= {_FUZZY_LEV_MAX}
                   THEN 2400 ELSE -1300 END
            + CASE WHEN a.segment = b.segment THEN 700 ELSE -900 END
            AS BIGINT) AS score_milli
  FROM a JOIN b ON a.phone = b.phone
)
SELECT custkey, agree_name, agree_segment, score_milli,
       CASE WHEN score_milli >= 2400 THEN 'match'
            WHEN score_milli >= 0 THEN 'possible'
            ELSE 'non_match' END AS verdict
FROM scored
"""


@query(
    "record_linkage_fuzzy_names",
    _FUZZY_LINKAGE_ORACLE,
    tags=("linkage", "entity-resolution", "levenshtein"),
)
def record_linkage_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter linkage with APPROXIMATE field agreement
    (``operators/linkage.py:levenshtein_within``): the twin's name lane
    carries single-edit typos (one substituted char on k%7, one
    appended on k%9 — and distance-2 noise on k%63 that must fall
    outside the band), so the edit-distance predicate is value-checked
    on both sides of its threshold alongside the exact-equality segment
    field. The levenshtein expression is JVM-side on the Spark plan and
    native in the DuckDB oracle — two independent implementations of
    the same integer metric under one hash."""
    from leader_graph_spark.operators.linkage import (
        fellegi_sunter_link,
        levenshtein_within,
    )

    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    a = cust.select(
        k.alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.md5(k.cast("string")).alias("phone"),
    )
    typo7 = F.when(
        k % 7 == 0,
        F.concat(F.substring("c_name", 1, 3), F.lit("x"), F.expr("substring(c_name, 5)")),
    ).otherwise(F.col("c_name"))
    b = cust.select(
        k.alias("k"),
        F.when(k % 9 == 0, F.concat(typo7, F.lit("x"))).otherwise(typo7).alias("name"),
        F.when(k % 5 == 0, F.lit("UNKNOWN")).otherwise(F.col("c_mktsegment")).alias("segment"),
        F.md5(k.cast("string")).alias("phone"),
    )
    linked = fellegi_sunter_link(
        a,
        b,
        block_on="phone",
        compare={
            "name": ("name", "name", levenshtein_within(_FUZZY_LEV_MAX)),
            "segment": ("segment", "segment"),
        },
        weights={"name": (2400, -1300), "segment": (700, -900)},
        match_threshold=2400,
        possible_threshold=0,
    )
    return linked.select(
        F.col("k_l").alias("custkey"),
        "agree_name",
        "agree_segment",
        "score_milli",
        "verdict",
    )


# ---------------------------------------------------------------------------
# End-to-end ENTITY RESOLUTION: linkage pairs -> connected components
# -> golden-record election. Three sources — the clean customer table
# and TWO independently-dirtied twins (side b reuses the
# record_linkage lanes; side c dirties different residue classes:
# k%3 name, k%4 segment, k%6 nation, k%17 phone) — are linked a<->b
# and a<->c by Fellegi-Sunter blocking joins; pairs with a `match`
# verdict become edges; components merge the cluster; one golden row
# per entity elects each field by (frequency DESC, value ASC) — fully
# deterministic, so the whole resolution sits under the value hash.
# Clusters are STARS centered on the clean record by construction
# (each twin row blocks only to its own original), so the SQL oracle
# resolves components with a single min-propagation round, while the
# Spark side runs the GENERAL iterative CC operator — two independent
# strategies, one fixture where both are exact.
# ---------------------------------------------------------------------------


def _fs_score_sql(lhs: str, rhs: str) -> str:
    return (
        f"CAST(CASE WHEN {lhs}.name = {rhs}.name THEN 2800 ELSE -1200 END"
        f" + CASE WHEN {lhs}.segment = {rhs}.segment THEN 700 ELSE -900 END"
        f" + CASE WHEN {lhs}.nation = {rhs}.nation THEN 1100 ELSE -1500 END AS BIGINT)"
    )


_ER_SIDES_SQL = """
a AS (
  SELECT c_custkey AS k, c_name AS name, c_mktsegment AS segment,
         c_nationkey AS nation, md5(CAST(c_custkey AS VARCHAR)) AS phone
  FROM customer
),
b AS (
  SELECT c_custkey AS k,
         CASE WHEN c_custkey % 7 = 0 THEN c_name || ' jr' ELSE c_name END AS name,
         CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS segment,
         CASE WHEN c_custkey % 11 = 0 THEN (c_nationkey + 7) % 25 ELSE c_nationkey END AS nation,
         CASE WHEN c_custkey % 13 = 0 THEN md5(CAST(c_custkey AS VARCHAR) || 'moved')
              ELSE md5(CAST(c_custkey AS VARCHAR)) END AS phone
  FROM customer
),
c AS (
  SELECT c_custkey AS k,
         CASE WHEN c_custkey % 3 = 0 THEN c_name || ' sr' ELSE c_name END AS name,
         CASE WHEN c_custkey % 4 = 0 THEN 'N/A' ELSE c_mktsegment END AS segment,
         CASE WHEN c_custkey % 6 = 0 THEN (c_nationkey + 3) % 25 ELSE c_nationkey END AS nation,
         CASE WHEN c_custkey % 17 = 0 THEN md5(CAST(c_custkey AS VARCHAR) || 'relocated')
              ELSE md5(CAST(c_custkey AS VARCHAR)) END AS phone
  FROM customer
)
"""

_ER_ORACLE = f"""
WITH {_ER_SIDES_SQL.strip()},
recs AS (
  SELECT 'a:' || CAST(k AS VARCHAR) AS rid, name, segment, nation FROM a
  UNION ALL
  SELECT 'b:' || CAST(k AS VARCHAR), name, segment, nation FROM b
  UNION ALL
  SELECT 'c:' || CAST(k AS VARCHAR), name, segment, nation FROM c
),
pairs AS (
  SELECT 'a:' || CAST(a.k AS VARCHAR) AS center, 'b:' || CAST(b.k AS VARCHAR) AS leaf
  FROM a JOIN b ON a.phone = b.phone
  WHERE {_fs_score_sql('a', 'b')} >= 2500
  UNION ALL
  SELECT 'a:' || CAST(a.k AS VARCHAR), 'c:' || CAST(c.k AS VARCHAR)
  FROM a JOIN c ON a.phone = c.phone
  WHERE {_fs_score_sql('a', 'c')} >= 2500
),
leaves AS (SELECT leaf AS rid, min(center) AS center FROM pairs GROUP BY 1),
ent AS (
  SELECT r.rid, COALESCE(l.center, r.rid) AS entity, r.name, r.segment, r.nation
  FROM recs r LEFT JOIN leaves l ON l.rid = r.rid
),
nm AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_members FROM ent GROUP BY 1),
gname AS (
  SELECT entity, name AS golden_name FROM (
    SELECT entity, name,
           row_number() OVER (PARTITION BY entity ORDER BY count(*) DESC, name ASC) AS rn
    FROM ent GROUP BY entity, name
  ) WHERE rn = 1
),
gseg AS (
  SELECT entity, segment AS golden_segment FROM (
    SELECT entity, segment,
           row_number() OVER (PARTITION BY entity ORDER BY count(*) DESC, segment ASC) AS rn
    FROM ent GROUP BY entity, segment
  ) WHERE rn = 1
),
gnat AS (
  SELECT entity, CAST(nation AS BIGINT) AS golden_nation FROM (
    SELECT entity, nation,
           row_number() OVER (PARTITION BY entity ORDER BY count(*) DESC, nation ASC) AS rn
    FROM ent GROUP BY entity, nation
  ) WHERE rn = 1
)
SELECT entity, n_members, golden_name, golden_segment, golden_nation
FROM nm JOIN gname USING (entity) JOIN gseg USING (entity) JOIN gnat USING (entity)
"""


def _er_third_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return cust.select(
        k.alias("k"),
        F.when(k % 3 == 0, F.concat(F.col("c_name"), F.lit(" sr")))
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when(k % 4 == 0, F.lit("N/A")).otherwise(F.col("c_mktsegment")).alias("segment"),
        F.when(k % 6 == 0, (F.col("c_nationkey") + 3) % 25)
        .otherwise(F.col("c_nationkey"))
        .alias("nation"),
        F.when(k % 17 == 0, F.md5(F.concat(k.cast("string"), F.lit("relocated"))))
        .otherwise(F.md5(k.cast("string")))
        .alias("phone"),
    )


@query(
    "entity_resolution_golden_records",
    _ER_ORACLE,
    tags=("linkage", "entity-resolution", "connected-components", "golden-record"),
)
def entity_resolution_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-source entity resolution end-to-end: Fellegi-Sunter
    blocking joins produce `match` pairs, the GENERAL iterative
    connected-components operator (`graph/algorithms.py`) merges them
    into entities, and a deterministic election — per-field mode with
    (count DESC, value ASC) tiebreak over the member rows — emits one
    golden record per entity with its member count. Scale shape: two
    blocking joins (each one shuffle per side on the high-cardinality
    key), CC over an edge set far smaller than the corpus, and three
    narrow groupBy+window passes over members for the election; no
    UDF, no collect. The star-shaped fixture keeps the SQL oracle to
    one min-propagation round while the engine runs unbounded
    propagation — agreement is exact because min-label CC converges to
    the same fixpoint regardless of rounds."""
    from pyspark.sql import Window

    from leader_graph_spark.graph.algorithms import connected_components
    from leader_graph_spark.operators.linkage import fellegi_sunter_link

    a, b = _fs_twin_sides(spark, sf_dir)
    c = _er_third_side(spark, sf_dir)

    def rid(prefix: str, col: str):
        return F.concat(F.lit(prefix), F.col(col).cast("string"))

    recs = (
        a.select(rid("a:", "k").alias("rid"), "name", "segment", "nation")
        .unionByName(b.select(rid("b:", "k").alias("rid"), "name", "segment", "nation"))
        .unionByName(c.select(rid("c:", "k").alias("rid"), "name", "segment", "nation"))
    )
    link_kw = dict(
        block_on="phone",
        compare={f: (f, f) for f in _FS_WEIGHTS},
        weights=_FS_WEIGHTS,
        match_threshold=_FS_MATCH,
        possible_threshold=_FS_POSSIBLE,
    )

    def match_edges(side: DataFrame, prefix: str) -> DataFrame:
        return (
            fellegi_sunter_link(a, side, **link_kw)
            .where(F.col("verdict") == "match")
            .select(
                F.concat(F.lit("a:"), F.col("k_l").cast("string")).alias("src"),
                F.concat(F.lit(prefix), F.col("k_r").cast("string")).alias("dst"),
            )
        )

    edges = match_edges(b, "b:").unionByName(match_edges(c, "c:"))
    comp = connected_components(recs.select(F.col("rid").alias("id")), edges)
    members = comp.join(recs, F.col("id") == F.col("rid")).select(
        F.col("component").alias("entity"), "name", "segment", "nation"
    )

    def elect(field: str, out: str, cast: str | None = None) -> DataFrame:
        cnt = members.groupBy("entity", field).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.partitionBy("entity").orderBy(F.col("cnt").desc(), F.col(field).asc())
        val = F.col(field).cast(cast) if cast else F.col(field)
        return (
            cnt.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("entity", val.alias(out))
        )

    n_members = members.groupBy("entity").agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
    return (
        n_members.join(elect("name", "golden_name"), "entity")
        .join(elect("segment", "golden_segment"), "entity")
        .join(elect("nation", "golden_nation", "bigint"), "entity")
        .select("entity", "n_members", "golden_name", "golden_segment", "golden_nation")
    )
