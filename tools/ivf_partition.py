#!/usr/bin/env python3
"""Partitioned pair verification for the IVF-family oracles — the scale
knob VERDICT r15 asked for (top_next): at 2 M vectors the monolithic
DuckIvfCtes chain materializes three n x sqrt(n) scalar pair tables of
~57 GB each, past any single-host budget. Per-vector argmax is
embarrassingly partitionable on vec_id, so this module replays the SAME
arithmetic in k bounded passes (pair table ~57/k GB per pass), lands the
tiny per-vector assignments in temp tables, and textually swaps the
heavy CTE prefix in each oracle SQL for references to those tables. The
serve suffix of every oracle runs verbatim, so the compared answer is
hashed exactly as the monolithic oracle would hash it.

Semantics preserved, not approximated:
 - every cosine / rounding / FLOAT-truncation expression is copied
   verbatim from the DuckIvfCtes / DuckIvf2Sql text (Similarity.scala);
 - the argmax decomposition (max(csim) + min-id-on-tie equi-join) is the
   r15 cross-validated form, applied per vec_id partition — a partition
   of the GROUP space, so per-group results are unchanged;
 - the window-form argmaxes of the two-level (ivf2) chain are resolved
   with the same max + min-on-tie join, value-identical to
   `row_number() ... ORDER BY csim DESC, id ... rn = 1` (the r15
   three-form cross-validation, zero mismatches at 30 k vectors).

Used by check_oracle.py when GRAFT_IVF_PARTITIONS=<k> is set; the
partitioned and monolithic paths are cross-validated green at sf0.1 and
10x before any decade run trusts this module.
"""

# start/end markers of the replaceable CTE prefixes, copied from
# Similarity.scala. Each must appear EXACTLY once in a matching oracle.
IVF_START = "stride AS (SELECT GREATEST"
IVF_END = "WHERE rn <= 4)"
IVF2_START = "par AS (SELECT n, leaves, k1"
IVF2_END = "WHERE rn <= 6)"

NUM_QUERIES = 5  # Similarity.NumQueries, embedded literally in the SQL


class IvfPartitionRewriter:
    def __init__(self, con, partitions, log=print):
        self.con = con
        self.p = max(1, int(partitions))
        self.log = log
        self._ivf_built = False
        self._ivf2_built = False

    # ---- shared partitioned argmax pass ----------------------------------

    def _assign_pass(self, pairs_sql_fmt, out, out_cols, agg_cols, label):
        """Create `out` and fill it partition by partition. pairs_sql_fmt
        must contain {j} (the vec_id % p residue) and produce scalar pair
        rows including vec_id and csim; agg_cols are the min()-on-tie
        columns resolving the argmax (copied tie-break order)."""
        import time
        self.con.sql(f"DROP TABLE IF EXISTS {out}")
        self.con.sql(f"CREATE TEMP TABLE {out}({out_cols})")
        mins = ", ".join(f"min(s.{c})" for c in agg_cols)
        for j in range(self.p):
            t0 = time.time()
            self.con.sql("DROP TABLE IF EXISTS pt_pairs")
            self.con.sql(
                "CREATE TEMP TABLE pt_pairs AS " + pairs_sql_fmt.format(j=j))
            self.con.sql(f"""
                INSERT INTO {out}
                SELECT s.vec_id, {mins} FROM pt_pairs s
                JOIN (SELECT vec_id, max(csim) AS m FROM pt_pairs
                      GROUP BY vec_id) mx
                  ON s.vec_id = mx.vec_id AND s.csim = mx.m
                GROUP BY s.vec_id""")
            self.con.sql("DROP TABLE IF EXISTS pt_pairs")
            self.log(f"    [{label}] partition {j + 1}/{self.p} "
                     f"({time.time() - t0:.0f}s)", flush=True)

    # ---- family A: the flat-IVF chain (DuckIvfCtes) -----------------------

    def _build_ivf(self):
        if self._ivf_built:
            return
        self.log(f"  [ivf-partitioned] building flat-IVF assignments "
                 f"(p={self.p})", flush=True)
        c = self.con
        c.sql("""CREATE TEMP TABLE pt_c0 AS
            SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS c
            FROM embeddings WHERE vec_id %
              (SELECT GREATEST(1, CAST(floor(sqrt(count(*))) AS BIGINT))
               FROM embeddings) = 0""")

        def pairs(cents):
            return (
                "SELECT e.vec_id, c.cent_id, "
                "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.c) "
                f"AS csim FROM embeddings e CROSS JOIN {cents} c "
                f"WHERE e.vec_id % {self.p} = {{j}}")

        def means(assign, out):
            # verbatim Lloyd-mean arithmetic: round(avg, 6) then
            # FLOAT-truncate, list ordered by dimension
            c.sql(f"""CREATE TEMP TABLE {out} AS
                SELECT cell AS cent_id,
                  list(CAST(CAST(m AS FLOAT) AS DOUBLE) ORDER BY pos) AS c FROM
                  (SELECT a.cell, t.i AS pos,
                     round(avg(CAST(e.embedding[t.i] AS DOUBLE)), 6) AS m
                   FROM {assign} a JOIN embeddings e ON e.vec_id = a.vec_id,
                     range(1, 65) t(i)
                   GROUP BY a.cell, t.i) GROUP BY cell""")

        self._assign_pass(pairs("pt_c0"), "pt_a1",
                          "vec_id BIGINT, cell BIGINT", ["cent_id"], "lloyd1")
        means("pt_a1", "pt_c1")
        self._assign_pass(pairs("pt_c1"), "pt_a2",
                          "vec_id BIGINT, cell BIGINT", ["cent_id"], "lloyd2")
        means("pt_a2", "pt_c2")
        self._assign_pass(pairs("pt_c2"), "pt_ivf_assigned",
                          "vec_id BIGINT, cell BIGINT", ["cent_id"], "assign")
        c.sql(f"""CREATE TEMP TABLE pt_ivf_qsims AS
            SELECT e.vec_id, c.cent_id,
              list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.c) AS csim
            FROM embeddings e CROSS JOIN pt_c2 c
            WHERE e.vec_id < {NUM_QUERIES}""")
        for t in ["pt_a1", "pt_a2", "pt_c0", "pt_c1"]:
            c.sql(f"DROP TABLE IF EXISTS {t}")
        self._ivf_built = True

    IVF_REPLACEMENT = """assigned AS (SELECT vec_id, cell FROM pt_ivf_assigned),
qsims AS (SELECT vec_id, cent_id, csim FROM pt_ivf_qsims),
probes AS (SELECT vec_id AS query_id, cent_id AS cell FROM
  (SELECT vec_id, cent_id, row_number() OVER
     (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
   FROM qsims)
  WHERE rn <= 4)"""

    # ---- family B: the two-level chain (DuckIvf2Sql) ----------------------

    def _build_ivf2(self):
        if self._ivf2_built:
            return
        c = self.con
        n = c.sql("SELECT count(*) FROM embeddings").fetchone()[0]
        import math
        leaves = max(1, int(math.floor(math.sqrt(n))))
        k1 = max(1, int(math.floor(math.sqrt(leaves))))
        subs = (leaves + k1 - 1) // k1
        stride1 = max(1, n // k1)
        self.log(f"  [ivf2-partitioned] n={n} leaves={leaves} k1={k1} "
                 f"subs={subs} stride1={stride1} (p={self.p})", flush=True)
        c.sql(f"""CREATE TEMP TABLE pt2_tseed AS
            SELECT vec_id AS tid, CAST(embedding AS DOUBLE[]) AS c
            FROM embeddings WHERE vec_id % {stride1} = 0""")
        # level-1 routing: argmax over k1 seeds, tie -> min tid
        self._assign_pass(
            "SELECT e.vec_id, t.tid, "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), t.c) AS csim "
            "FROM embeddings e CROSS JOIN pt2_tseed t "
            f"WHERE e.vec_id % {self.p} = {{j}}",
            "pt2_tassign", "vec_id BIGINT, top BIGINT", ["tid"], "ivf2-route")
        # sub-seeds: md5-prefix-ordered reservoir per super cell (verbatim)
        c.sql(f"""CREATE TEMP TABLE pt2_sseed AS
            SELECT a.vec_id AS leaf, a.top AS l_top,
              CAST(e.embedding AS DOUBLE[]) AS c
            FROM (SELECT vec_id, top, row_number() OVER (PARTITION BY top
                    ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT),
                             vec_id) AS rn
                  FROM pt2_tassign) a JOIN embeddings e ON e.vec_id = a.vec_id
            WHERE a.rn <= {subs}""")
        # leaf assignment within the super cell (seed pass), tie -> min leaf;
        # `top` rides along (functionally dependent on vec_id)
        self._assign_pass(
            "SELECT ta.vec_id, ta.top, s.leaf, "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.c) AS csim "
            "FROM pt2_tassign ta JOIN embeddings e ON e.vec_id = ta.vec_id "
            "JOIN pt2_sseed s ON s.l_top = ta.top "
            f"WHERE ta.vec_id % {self.p} = {{j}}",
            "pt2_a0", "vec_id BIGINT, top BIGINT, leaf BIGINT",
            ["top", "leaf"], "ivf2-seed-assign")
        # one refinement pass (verbatim round+FLOAT-truncate means)
        c.sql("""CREATE TEMP TABLE pt2_lref AS
            SELECT leaf, min(l_top) AS l_top,
              list(CAST(CAST(m AS FLOAT) AS DOUBLE) ORDER BY pos) AS c FROM
              (SELECT a.leaf, a.top AS l_top, t.i AS pos,
                 round(avg(CAST(e.embedding[t.i] AS DOUBLE)), 6) AS m
               FROM pt2_a0 a JOIN embeddings e ON e.vec_id = a.vec_id,
                 range(1, 65) t(i)
               GROUP BY a.leaf, a.top, t.i) GROUP BY leaf""")
        self._assign_pass(
            "SELECT ta.vec_id, l.leaf, "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), l.c) AS csim "
            "FROM pt2_tassign ta JOIN embeddings e ON e.vec_id = ta.vec_id "
            "JOIN pt2_lref l ON l.l_top = ta.top "
            f"WHERE ta.vec_id % {self.p} = {{j}}",
            "pt2_afin", "vec_id BIGINT, leaf BIGINT", ["leaf"], "ivf2-assign")
        # query-side multi-probe: O(queries), runs whole (verbatim windows)
        c.sql(f"""CREATE TEMP TABLE pt2_probes2 AS
            WITH qtops AS (SELECT query_id, top FROM (
              SELECT e.vec_id AS query_id, t.tid AS top,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), t.c) DESC, t.tid) AS rn
              FROM embeddings e CROSS JOIN pt2_tseed t
              WHERE e.vec_id < {NUM_QUERIES}) WHERE rn <= 3)
            SELECT query_id, leaf FROM (
              SELECT q.query_id, l.leaf, row_number() OVER (PARTITION BY q.query_id
                ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), l.c) DESC, l.leaf) AS rn
              FROM qtops q JOIN embeddings e ON e.vec_id = q.query_id
                JOIN pt2_lref l ON l.l_top = q.top) WHERE rn <= 6""")
        for t in ["pt2_a0", "pt2_sseed", "pt2_lref", "pt2_tseed",
                  "pt2_tassign"]:
            c.sql(f"DROP TABLE IF EXISTS {t}")
        self._ivf2_built = True

    IVF2_REPLACEMENT = """afin AS (SELECT vec_id, leaf FROM pt2_afin),
probes2 AS (SELECT query_id, leaf FROM pt2_probes2)"""

    # ---- the rewrite entry point ------------------------------------------

    def rewrite(self, sql):
        """Swap a recognized heavy CTE prefix for precomputed-table refs;
        non-IVF oracles pass through untouched."""
        if IVF_START in sql:
            assert sql.count(IVF_START) == 1 and sql.count(IVF_END) == 1, \
                "IVF CTE markers drifted from Similarity.scala"
            self._build_ivf()
            a = sql.index(IVF_START)
            b = sql.index(IVF_END) + len(IVF_END)
            return sql[:a] + self.IVF_REPLACEMENT + sql[b:]
        if IVF2_START in sql:
            assert sql.count(IVF2_START) == 1 and sql.count(IVF2_END) == 1, \
                "IVF2 CTE markers drifted from Similarity.scala"
            self._build_ivf2()
            a = sql.index(IVF2_START)
            b = sql.index(IVF2_END) + len(IVF2_END)
            return sql[:a] + self.IVF2_REPLACEMENT + sql[b:]
        return sql
