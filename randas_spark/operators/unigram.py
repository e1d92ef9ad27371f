"""Unigram-LM subword tokenizer (SentencePiece-style) learned by hard
EM with EXACT integer Viterbi — the second major subword family next to
BPE (operators/corpus.py): BPE grows a vocabulary bottom-up by merging,
unigram-LM starts from a candidate set and lets segmentation likelihood
choose. Reference scope: the randas crate stops at whitespace tokens;
this is the training-data-pipeline extension the brief calls for.

Determinism discipline (the BPE/logreg law, pushed further): piece
costs are QUANTIZED to integer micro-nats (``floor(-ln(p)*1e6 + 0.5)``,
the repo-wide fround(6) atom), so the Viterbi DP is pure int64
arithmetic — cross-engine equality needs no float reasoning at all, and
ties break on the total order (cost, n_pieces, -piece_len): prefer
cheaper, then fewer, then longer-final-piece segmentations.

Hard-EM rounds (fixed count, both engines):
  vocab0 = top-V candidate substrings (len 1..k_max) by corpus
           occurrence count, ties piece-ascending, UNION all single
           chars (coverage guarantee: every word stays segmentable);
  cost0  = -ln(f / sum f) quantized;              E-step: Viterbi;
  M-step: recount piece occurrences from the segmentations (weighted
           by word counts) over the FIXED vocab, add-1 smoothed
           cost = -ln((f+1)/(T+|V|)) quantized;   repeat.

Distribution shape: the corpus contracts ONCE to the distinct-word
table (Heaps-bounded — the BPE-learn insight); candidate generation and
recounts are explode+groupBy over that table; each E-step is one
Arrow-batched pandas_udf pass with the <=(V + alphabet)-entry cost dict
broadcast. Driver state: the vocab/cost table (tiny), never data-sized.
At 100 TB the word table is the only thing that grows, sublinearly.

The SQL twin replicates everything in DuckDB, Viterbi included: the DP
is macro-expanded over positions 1..l_max as lateral-alias struct
columns (candidates per position via map_extract against the in-query
cost map; min by struct order), and the backtrace is a second
macro-expanded cursor walk — so the oracle re-derives the ENTIRE model
from the raw corpus with zero values smuggled from the Python side.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _q_cost(num: float, den: float) -> int:
    """floor(-ln(num/den) * 1e6 + 0.5) — the integer micro-nat atom."""
    return int(math.floor(-math.log(num / den) * 1_000_000 + 0.5))


def _viterbi(word: str, cost: dict[str, int], k_max: int) -> list[str]:
    """Exact-integer Viterbi segmentation. best[pos] = (cost, n_pieces,
    -k, k) minimized lexicographically. For words from the training
    corpus a path always exists (the vocab unions every single char);
    applying a learned model to NEW text can hit out-of-vocabulary
    characters, which used to die with a bare ``min() arg is an empty
    sequence`` inside the executor (ADVICE r7) — now a descriptive
    error names the character and the fix."""
    best: list[tuple[int, int, int, int]] = [(0, 0, 0, 0)]
    for pos in range(1, len(word) + 1):
        cands = []
        for k in range(1, min(k_max, pos) + 1):
            c = cost.get(word[pos - k : pos])
            if c is None:
                continue
            pc, pn, _, _ = best[pos - k]
            cands.append((pc + c, pn + 1, -k, k))
        if not cands:
            raise ValueError(
                f"unigram _viterbi: no vocab piece covers position "
                f"{pos - 1} of word {word!r} (character {word[pos - 1]!r} "
                f"is out-of-vocabulary for this model); re-learn with a "
                f"corpus containing it or map OOV characters to a known "
                f"placeholder before segmenting"
            )
        best.append(min(cands))
    pieces: list[str] = []
    pos = len(word)
    while pos > 0:
        k = best[pos][3]
        pieces.append(word[pos - k : pos])
        pos -= k
    pieces.reverse()
    return pieces


def _word_table(df: DataFrame, text_col: str, l_max: int) -> DataFrame:
    from randas_spark.functions.text import tokens

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") <= l_max))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def _segment_col(cost: dict[str, int], k_max: int):
    bc = dict(cost)

    @F.pandas_udf("array<string>")
    def seg(ws: pd.Series) -> pd.Series:
        return ws.map(lambda w: _viterbi(w, bc, k_max))

    return seg


def _learn_kernel(vocab_size: int, k_max: int, rounds: int):
    """The whole EM learn as ONE Arrow kernel over the Heaps-bounded
    word table (the bpe_learn pattern, optimization guide §1.2/§4.2):
    candidate counting, top-k vocab pick, and every Viterbi E-step are
    decisions over |distinct words| rows — inherently sequential and
    tiny — so the per-round Spark formulation paid 1 checkpoint + 1
    vocab collect + 2 collect jobs per EM round (~8 driver round trips
    measured) for work one task finishes in milliseconds. All model
    math is exact integers (_q_cost micro-nats, long sums), so the
    kernel replays the retired distributed form bit-for-bit: the
    candidate sums are order-free integer adds, the top-k tie-break
    (f DESC, p ASC) matches Spark's binary UTF8 ordering (UTF-8 byte
    order preserves code-point order), and _viterbi is the identical
    function the pandas_udf ran.

    MEMORY BOUND (r14, VERDICT r13 order #3 — same contract as
    bpe_learn's kernel, see operators/corpus.py for the full note): the
    repartition(1) task holds the whole distinct-word table in one
    pandas frame. Measured cells (BASELINE.md r14): sf0.1 = 31 rows /
    ~1.9 KB, sf1.0 = 340 rows / ~22 KB, sf10 = 3130 rows / ~201 KB
    (the scaled fixtures' space-split copy markers DO grow this table,
    unlike BPE's [^a-z]+ split — still KB-scale). Heaps extrapolation
    for real text puts ~1e8 distinct words / ~6-10 GB in one task at
    100 TB: past ~1e7 distinct words (~1 GB), swap to the two-level
    form (distributed candidate-count agg per EM round + driver
    decision — the pre-r13 shape)."""

    def _em(pdfs):
        ws: list[str] = []
        cs: list[int] = []
        for pdf in pdfs:
            ws.extend(pdf["w"].tolist())
            cs.extend(int(c) for c in pdf["c"].tolist())
        cand: dict[str, int] = {}
        for w, c in zip(ws, cs):
            lw = len(w)
            for s in range(lw):
                for k in range(1, min(k_max, lw - s) + 1):
                    p = w[s : s + k]
                    cand[p] = cand.get(p, 0) + c
        vocab = dict(
            sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
        )
        for p, f in cand.items():
            if len(p) == 1:
                vocab[p] = f
        total = sum(vocab.values())
        cost = {p: _q_cost(f, total) for p, f in vocab.items()}
        freqs: dict[str, int] = {}
        for _ in range(rounds):
            counted: dict[str, int] = {}
            for w, c in zip(ws, cs):
                for p in _viterbi(w, cost, k_max):
                    counted[p] = counted.get(p, 0) + c
            freqs = {p: counted.get(p, 0) for p in vocab}
            t = sum(freqs.values())
            v_n = len(vocab)
            cost = {p: _q_cost(f + 1, t + v_n) for p, f in freqs.items()}
        rows = sorted((p, freqs[p], cost[p]) for p in vocab)
        if rows:
            yield pd.DataFrame(
                {
                    "piece": [r[0] for r in rows],
                    "freq": pd.Series([r[1] for r in rows], dtype="int64"),
                    "cost_micro": pd.Series([r[2] for r in rows], dtype="int64"),
                }
            )

    return _em


def _learn_frame(
    words: DataFrame, vocab_size: int, k_max: int, rounds: int
) -> DataFrame:
    if rounds < 1:
        raise ValueError(f"unigram_learn requires rounds >= 1, got {rounds}")
    return words.repartition(1).mapInPandas(
        _learn_kernel(vocab_size, k_max, rounds),
        schema="piece string, freq long, cost_micro long",
    )


def unigram_learn(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 32,
    k_max: int = 4,
    l_max: int = 12,
    rounds: int = 2,
) -> DataFrame:
    """Learn the unigram-LM vocabulary; returns one row per piece:
    (piece, freq, cost_micro) where freq is the final E-step occurrence
    recount and cost_micro the add-1-smoothed cost derived from it.
    The plan is ONE lazy job: distributed word-table scan+agg ->
    single-partition exchange -> EM kernel (see _learn_kernel)."""
    return _learn_frame(
        _word_table(df, text_col, l_max), vocab_size, k_max, rounds
    )


def unigram_segment(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 32,
    k_max: int = 4,
    l_max: int = 12,
    rounds: int = 2,
) -> DataFrame:
    """Segment the distinct-word table with the learned model: one row
    per word (w, c, n_pieces, seg) with seg = '|'-joined pieces (string,
    not array — the driver canon contract). The word table is built
    once (localCheckpoint) and feeds BOTH the learn kernel and the
    segmentation scan — the learn-then-rebuild form paid the corpus
    scan+agg twice."""
    words = _word_table(df, text_col, l_max).localCheckpoint()
    learned = _learn_frame(words, vocab_size, k_max, rounds)
    cost = {r["piece"]: int(r["cost_micro"]) for r in learned.collect()}
    pieces = _segment_col(cost, k_max)(F.col("w"))
    return words.select(
        "w",
        "c",
        F.size(pieces).cast("long").alias("n_pieces"),
        F.array_join(pieces, "|").alias("seg"),
    )


# --------------------------------------------------------------------------
# SQL twins (DuckDB) — the full model re-derivation, Viterbi included
# --------------------------------------------------------------------------


def _sql_viterbi_struct(pos: int, k_max: int) -> str:
    """Lateral-alias DP step: s{pos} = min candidate struct at position
    ``pos``, referencing s{pos-k} (s0 is the base). Struct field order
    (cost, np, negk, k) IS the comparison order."""
    cands = []
    for k in range(1, k_max + 1):
        prev = f"s{pos - k}" if pos - k > 0 else "s0"
        piece = f"substr(w, {pos - k + 1}, {k})"
        cands.append(
            f"CASE WHEN {pos} >= {k} AND len(w) >= {pos} "
            f"AND len(map_extract(m, {piece})) = 1 "
            f"THEN {{'cost': struct_extract({prev}, 'cost') + map_extract(m, {piece})[1], "
            f"'np': struct_extract({prev}, 'np') + 1, 'negk': {-k}, 'k': {k}}} END"
        )
    return (
        f"list_sort(list_filter([{', '.join(cands)}], x -> x IS NOT NULL))[1]"
        f" AS s{pos}"
    )


def _sql_viterbi_seg(alias: str, map_cte: str, k_max: int, l_max: int) -> str:
    """One CTE segmenting every word against cost map ``map_cte``:
    (w, c, pieces). Each DP position and each backtrace step is its own
    NESTED SUBQUERY level adding one column — same-select lateral
    aliases would INLINE each other and the expression tree would grow
    4^l_max (the k-core/BPE lazy-chain lesson, at the expression level);
    a projection column is evaluated once per row per level."""
    # innermost level: the base struct
    inner = (
        f"SELECT w, c, m, "
        f"{{'cost': CAST(0 AS BIGINT), 'np': 0, 'negk': 0, 'k': 0}} AS s0 "
        f"FROM wt, {map_cte}"
    )
    for pos in range(1, l_max + 1):
        inner = f"SELECT *, {_sql_viterbi_struct(pos, k_max)} FROM ({inner})"
    poss = "[" + ", ".join(f"s{p}" for p in range(1, l_max + 1)) + "]"
    inner = f"SELECT w, c, {poss} AS poss, len(w) AS p0 FROM ({inner})"
    piece_cols = []
    for i in range(1, l_max + 1):
        prev = f"p{i - 1}"
        kk = f"struct_extract(poss[{prev}], 'k')"
        inner = (
            f"SELECT *, "
            f"CASE WHEN {prev} > 0 THEN substr(w, {prev} - {kk} + 1, {kk}) END AS pc{i}, "
            f"CASE WHEN {prev} > 0 THEN {prev} - {kk} ELSE 0 END AS p{i} "
            f"FROM ({inner})"
        )
        piece_cols.append(f"pc{i}")
    return f"""{alias} AS MATERIALIZED (
        SELECT w, c,
               list_reverse(list_filter([{", ".join(piece_cols)}],
                                        x -> x IS NOT NULL)) AS pieces,
               struct_extract(poss[p0], 'cost') AS wc
        FROM ({inner})
    )"""


def _sql_recount(seg_alias: str, vocab_cte: str, out_alias: str) -> str:
    return f"""{out_alias} AS MATERIALIZED (
        SELECT v.p, CAST(COALESCE(s.n, 0) AS BIGINT) AS f
        FROM {vocab_cte} v LEFT JOIN (
            SELECT piece AS p, sum(c) AS n
            FROM (SELECT c, unnest(pieces) AS piece FROM {seg_alias})
            GROUP BY piece
        ) s USING (p)
    )"""


_SQL_QCOST = "CAST(floor(-ln({num}) * 1000000 + 0.5) AS BIGINT)"


def _sql_base(table: str, text_col: str, vocab_size: int, k_max: int, l_max: int) -> list[str]:
    from randas_spark.functions.text import sql_tokens

    return [
        f"""wt AS MATERIALIZED (
            SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT unnest({sql_tokens(text_col)}) AS w FROM {table}
            ) WHERE w <> '' AND len(w) <= {l_max}
            GROUP BY w
        )""",
        f"""cands AS MATERIALIZED (
            SELECT substr(w, s.s, k.k) AS p, CAST(sum(c) AS BIGINT) AS f
            FROM wt,
                 generate_series(1, {l_max}) AS s(s),
                 generate_series(1, {k_max}) AS k(k)
            WHERE s.s + k.k - 1 <= len(w)
            GROUP BY 1
        )""",
        f"""vocab0 AS MATERIALIZED (
            SELECT DISTINCT p, f FROM (
                SELECT p, f FROM (SELECT p, f FROM cands ORDER BY f DESC, p LIMIT {vocab_size})
                UNION ALL
                SELECT p, f FROM cands WHERE len(p) = 1
            )
        )""",
        "tot0 AS (SELECT CAST(sum(f) AS DOUBLE) AS t, count(*) AS vn FROM vocab0)",
        f"""cost0 AS (
            SELECT p, {_SQL_QCOST.format(num='CAST(f AS DOUBLE) / t')} AS cost
            FROM vocab0, tot0
        )""",
        "map0 AS (SELECT map(list(p ORDER BY p), list(cost ORDER BY p)) AS m FROM cost0)",
    ]


def _sql_rounds(rounds: int, k_max: int, l_max: int) -> list[str]:
    ctes = []
    for r in range(1, rounds + 1):
        ctes.append(_sql_viterbi_seg(f"seg{r}", f"map{r - 1}", k_max, l_max))
        ctes.append(_sql_recount(f"seg{r}", "vocab0", f"f{r}"))
        ctes.append(
            f"tot{r} AS (SELECT CAST(sum(f) AS DOUBLE) AS t, count(*) AS vn FROM f{r})"
        )
        ctes.append(
            f"""cost{r} AS (
                SELECT p,
                       {_SQL_QCOST.format(num=f'(CAST(f AS DOUBLE) + 1.0) / (t + vn)')} AS cost
                FROM f{r}, tot{r}
            )"""
        )
        ctes.append(
            f"map{r} AS (SELECT map(list(p ORDER BY p), list(cost ORDER BY p)) AS m FROM cost{r})"
        )
    return ctes


def sql_unigram_learn(
    table: str,
    text_col: str,
    vocab_size: int = 32,
    k_max: int = 4,
    l_max: int = 12,
    rounds: int = 2,
) -> str:
    ctes = _sql_base(table, text_col, vocab_size, k_max, l_max)
    ctes += _sql_rounds(rounds, k_max, l_max)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
        SELECT f.p AS piece, f.f AS freq, c.cost AS cost_micro
        FROM f{rounds} f JOIN cost{rounds} c USING (p)
        """
    )


def sql_unigram_segment(
    table: str,
    text_col: str,
    vocab_size: int = 32,
    k_max: int = 4,
    l_max: int = 12,
    rounds: int = 2,
) -> str:
    ctes = _sql_base(table, text_col, vocab_size, k_max, l_max)
    ctes += _sql_rounds(rounds, k_max, l_max)
    ctes.append(_sql_viterbi_seg("segf", f"map{rounds}", k_max, l_max))
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
        SELECT w, c, CAST(len(pieces) AS BIGINT) AS n_pieces,
               array_to_string(pieces, '|') AS seg
        FROM segf
        """
    )


def unigram_doc_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 32,
    k_max: int = 4,
    l_max: int = 12,
    rounds: int = 2,
) -> DataFrame:
    """Per-document cost under the learned unigram LM — the
    tokenizer-native quality proxy (a document whose words segment
    cheaply is in-distribution for the corpus the model was fit on;
    perplexity filtering with OUR OWN model instead of an external LM).
    Words longer than l_max are outside the model and excluded.

    Output: (id, n_words, total_cost_micro, avg_nats) where avg_nats =
    mean per-word Viterbi cost in nats. Scale: word costs come from the
    Heaps-bounded word table (one pandas_udf pass), broadcast back onto
    the exploded corpus — the data-sized stage is one explode + one
    broadcast join + one map-side-combined groupBy of int sums."""
    from randas_spark.functions.text import tokens

    learned = unigram_learn(df, text_col, vocab_size, k_max, l_max, rounds)
    cost = {r["piece"]: int(r["cost_micro"]) for r in learned.collect()}
    bc, km = dict(cost), k_max

    @F.pandas_udf("long")
    def wcost(ws: pd.Series) -> pd.Series:
        return ws.map(lambda w: sum(bc[p] for p in _viterbi(w, bc, km)))

    word_costs = _word_table(df, text_col, l_max).select(
        "w", wcost(F.col("w")).alias("wc")
    )
    dw = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    ).filter((F.col("w") != "") & (F.length("w") <= l_max))
    from randas_spark.queries import fround

    return (
        dw.join(F.broadcast(word_costs), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("wc").cast("long").alias("total_cost_micro"),
        )
        .select(
            id_col,
            "n_words",
            "total_cost_micro",
            fround(
                F.col("total_cost_micro").cast("double")
                / F.col("n_words")
                / F.lit(1000000.0),
                6,
            ).alias("avg_nats"),
        )
    )


def sql_unigram_doc_score(
    table: str,
    id_col: str,
    text_col: str,
    vocab_size: int = 32,
    k_max: int = 4,
    l_max: int = 12,
    rounds: int = 2,
) -> str:
    from randas_spark.functions.text import sql_tokens
    from randas_spark.queries import sql_fround

    ctes = _sql_base(table, text_col, vocab_size, k_max, l_max)
    ctes += _sql_rounds(rounds, k_max, l_max)
    ctes.append(_sql_viterbi_seg("segf", f"map{rounds}", k_max, l_max))
    ctes.append(
        f"""dw AS (
            SELECT {id_col}, w FROM (
                SELECT {id_col}, unnest({sql_tokens(text_col)}) AS w FROM {table}
            ) WHERE w <> '' AND len(w) <= {l_max}
        )"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
        SELECT dw.{id_col},
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(s.wc) AS BIGINT) AS total_cost_micro,
               {sql_fround(f'CAST(sum(s.wc) AS DOUBLE) / count(*) / 1000000.0', 6)} AS avg_nats
        FROM dw JOIN segf s USING (w)
        GROUP BY dw.{id_col}
        """
    )
