"""BPE merge-table induction re-expressed as ONE DuckDB SQL statement
— the oracle twin of operators/bpe.bpe_train, which graduates
``bpe_merges_corpus`` from rows-only to hash-matching.

The iterative merge loop is UNROLLED: each round is a fixed CTE block
(pair counts -> argmax with the same DESC-count / lexicographic
tie-break -> greedy left-to-right merge), so 12 merges become 12
mechanical blocks over the distinct-word table, exactly the shape
xxh64_sql.py uses for the hash stripe loop. The greedy merge is
relational, not a fold: for a merge pair (a, b) with a != b adjacent
matches can never overlap (a match at both j and j+1 would force
a = b), so every marked position merges; for a == b a run of k
consecutive ``a`` symbols greedily merges at run-relative odd offsets
(gaps-and-islands row numbering) — floor(k/2) merges with an odd
leftover, byte-identical to the Spark side's left fold
(operators/bpe._merge_pair_expr).

An empty round (no adjacent pairs remain) LEFT-JOINs through: the
symbol table passes unchanged and the round contributes no merge row,
matching bpe_train's loop break.
"""

from __future__ import annotations


def _round(i: int) -> str:
    """CTE block for merge round ``i`` (state t{i-1} -> t{i})."""
    p = i - 1
    return f"""
p{i} AS (
  SELECT sym AS a, LEAD(sym) OVER (PARTITION BY w ORDER BY pos) AS b,
         freq
  FROM t{p}
),
c{i} AS (
  SELECT a, b, SUM(freq) AS n FROM p{i} WHERE b IS NOT NULL GROUP BY a, b
),
b{i} AS MATERIALIZED (SELECT a, b, n FROM c{i} ORDER BY n DESC, a, b LIMIT 1),
m{i} AS (
  SELECT t.w, t.freq, t.pos, t.sym, bb.a || bb.b AS ab,
         COALESCE(
           t.sym = bb.a
           AND LEAD(t.sym) OVER (PARTITION BY t.w ORDER BY t.pos) = bb.b,
           FALSE) AS cand
  FROM t{p} t LEFT JOIN b{i} bb ON TRUE
),
g{i} AS (
  SELECT *,
         CASE WHEN cand THEN pos - ROW_NUMBER()
              OVER (PARTITION BY w, cand ORDER BY pos) END AS grp
  FROM m{i}
),
s{i} AS (
  SELECT *,
         CASE WHEN cand THEN ROW_NUMBER()
              OVER (PARTITION BY w, grp ORDER BY pos) % 2 = 1
              ELSE FALSE END AS strt
  FROM g{i}
),
d{i} AS (
  SELECT *,
         COALESCE(LAG(strt) OVER (PARTITION BY w ORDER BY pos),
                  FALSE) AS gone
  FROM s{i}
),
t{i} AS MATERIALIZED (
  SELECT w, freq,
         ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS pos,
         CASE WHEN strt THEN ab ELSE sym END AS sym
  FROM d{i} WHERE NOT gone
)"""


def bpe_merge_sql(num_merges: int = 12) -> str:
    """The full statement: documents -> word frequencies -> per-char
    symbol table -> ``num_merges`` unrolled rounds -> merge table
    (rank, left, right, pair_count) in merge order."""
    rounds = ",".join(_round(i) for i in range(1, num_merges + 1))
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INTEGER) AS rank, a AS \"left\","
        f" b AS \"right\", CAST(n AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, num_merges + 1)
    )
    return f"""
WITH tok AS (
  SELECT UNNEST(list_filter(string_split(lower(text),' '), x -> x <> ''))
         AS w
  FROM documents
),
words AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY w),
t0 AS (
  SELECT w, freq, i AS pos, w[i] AS sym
  FROM words, UNNEST(range(1, length(w) + 1)) AS r(i)
),
{rounds}
{finals}
"""


def bpe_token_counts_sql(num_merges: int = 12) -> str:
    """Oracle twin of operators/bpe.bpe_token_counts: the SAME unrolled
    training rounds (the final symbol table t{N} IS the trained
    segmentation of every corpus word), finished with a doc-level
    re-explode joined to per-word symbol counts. Hash equality
    therefore pins the whole tokenizer round trip — train, segment,
    encode — per document."""
    rounds = ",".join(_round(i) for i in range(1, num_merges + 1))
    return f"""
WITH tok AS (
  SELECT UNNEST(list_filter(string_split(lower(text),' '), x -> x <> ''))
         AS w
  FROM documents
),
words AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY w),
t0 AS (
  SELECT w, freq, i AS pos, w[i] AS sym
  FROM words, UNNEST(range(1, length(w) + 1)) AS r(i)
),
{rounds},
wseg AS (SELECT w, COUNT(*) AS n_sym FROM t{num_merges} GROUP BY w),
dw AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split(lower(text),' '), x -> x <> ''))
           AS w
  FROM documents
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens
FROM dw JOIN wseg USING (w) GROUP BY doc_id
"""
