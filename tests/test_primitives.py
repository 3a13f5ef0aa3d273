"""Property-based tests (hypothesis) for the pure primitives — the
shipped SQL/expression artifacts are exercised through DuckDB so the
tests cover what actually runs, not a Python re-derivation."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from astra_perseverance_spark.functions.percentiles import GC_PCTS, nearest_rank_sql
from astra_perseverance_spark.functions.texthash import h15_sql
from astra_perseverance_spark.sinks.xlsx import _col_letter


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


class TestNearestRank:
    """The engine's index formula must equal the reference's
    ``int(round(n·p)) − 1`` with CPython banker's rounding and the
    −1 → n−1 wrap (explore.py:364-398)."""

    @settings(max_examples=200, deadline=None)
    @given(n=st.integers(min_value=1, max_value=100_000))
    def test_matches_python_round_semantics(self, n):
        con = duckdb.connect()
        for pct in GC_PCTS:
            ref_idx = int(round(n * pct / 100)) - 1
            if ref_idx < 0:
                ref_idx = n - 1
            got = con.sql(
                f"SELECT {nearest_rank_sql(str(n), pct)}"
            ).fetchone()[0]
            assert got == ref_idx + 1, (n, pct)

    def test_half_even_tie_cases(self, con):
        # n·p/100 landing exactly on .5: n=50, p=50 → 25.0 is not a
        # tie; n=2, p=75 → 1.5 → banker's round = 2 → idx 1
        assert int(round(2 * 75 / 100)) == 2
        got = con.sql(f"SELECT {nearest_rank_sql('2', 75)}").fetchone()[0]
        assert got == 2
        # n=6, p=75 → 4.5 → banker's = 4 → idx 3 → rank 4
        assert int(round(6 * 75 / 100)) == 4
        got = con.sql(f"SELECT {nearest_rank_sql('6', 75)}").fetchone()[0]
        assert got == 4


class TestH15:
    """DuckDB's nibble-parse twin must equal Python's
    ``int(md5(s)[:15], 16)`` — the definition Spark's
    ``conv(substr(md5, 1, 15), 16, 10)`` implements."""

    @settings(max_examples=100, deadline=None)
    @given(s=st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E,
                               exclude_characters="'\\"),
        max_size=80,
    ))
    def test_matches_hashlib(self, s):
        con = duckdb.connect()
        want = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        got = con.sql(f"SELECT {h15_sql(chr(39) + s + chr(39))}").fetchone()[0]
        assert got == want

    def test_range(self, con):
        got = con.sql(f"SELECT {h15_sql(chr(39) + 'x' + chr(39))}").fetchone()[0]
        assert 0 <= got < 1 << 60


class TestColLetter:
    @given(i=st.integers(min_value=0, max_value=16_383))
    def test_roundtrip(self, i):
        s = _col_letter(i)
        # decode back
        val = 0
        for ch in s:
            val = val * 26 + (ord(ch) - ord("A") + 1)
        assert val - 1 == i

    def test_known_values(self):
        assert _col_letter(0) == "A"
        assert _col_letter(25) == "Z"
        assert _col_letter(26) == "AA"
        assert _col_letter(701) == "ZZ"
        assert _col_letter(702) == "AAA"


class TestSaltedTopK:
    def test_matches_naive_window(self, spark):
        """Exact two-phase top-k must equal the single-window top-k on
        a skewed synthetic frame (one giant group, one tiny one)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from astra_perseverance_spark.functions.ordering import salted_topk

        rows = [("big", i, (i * 37) % 1000) for i in range(5000)]
        rows += [("small", i, i) for i in range(3)]
        df = spark.createDataFrame(rows, "grp string, id long, score long")

        k = 7
        order = [F.desc("score"), "id"]
        naive = (
            df.withColumn(
                "rank",
                F.row_number().over(Window.partitionBy("grp").orderBy(*order)),
            )
            .filter(F.col("rank") <= k)
        )
        got = {(r["grp"], r["rank"], r["id"])
               for r in salted_topk(df, ["grp"], order, k, salt_on="id").collect()}
        want = {(r["grp"], r["rank"], r["id"]) for r in naive.collect()}
        assert got == want
        # the tiny group keeps all its rows, ranked 1..3
        assert {(g, rk) for g, rk, _ in got if g == "small"} == {
            ("small", 1), ("small", 2), ("small", 3)
        }


class TestCosineZeroNorm:
    def test_zero_norm_vector_yields_null_not_ansi_error(self, spark):
        """An embedding whose components all quantize to zero has
        n2 = 0; under Spark 4's default ANSI mode a plain division
        would raise DIVIDE_BY_ZERO and kill the whole query on one
        degenerate row.  cosine() must yield NULL there (DuckDB's /
        does the same, so the twins agree)."""
        import duckdb

        from pyspark.sql import functions as F

        from astra_perseverance_spark.functions.vectors import (
            cosine,
            dot_q,
        )

        df = spark.createDataFrame(
            [(1, [2, 3], [0, 0]), (2, [2, 0], [2, 0])],
            "id long, a array<long>, b array<long>")
        got = {r["id"]: r["c"] for r in df.select(
            "id",
            cosine(dot_q(F.col("a"), F.col("b")),
                   dot_q(F.col("a"), F.col("a")),
                   dot_q(F.col("b"), F.col("b"))).alias("c"),
        ).collect()}
        assert got[1] is None
        assert got[2] == pytest.approx(1.0)
        assert duckdb.sql("SELECT 1.0 / 0.0").fetchone()[0] is None

    def test_salted_topk_guards_reserved_columns(self, spark):
        from astra_perseverance_spark.functions.ordering import salted_topk

        df = spark.createDataFrame([(1, 2, 3)], "grp long, id long, rank long")
        with pytest.raises(ValueError, match="rank"):
            salted_topk(df, ["grp"], ["id"], 3, salt_on="id")


class TestConnectedComponentsRandom:
    def test_random_graphs_match_union_find(self, spark):
        """30 random graphs (disjoint id spaces) unioned into ONE
        Spark connected_components call, checked against a Python
        union-find oracle."""
        import random

        from astra_perseverance_spark.functions.graph import (
            connected_components,
        )

        rng = random.Random(42)
        edges: list[tuple[int, int]] = []
        for g in range(30):
            base = g * 1000
            n = rng.randint(2, 40)
            m = rng.randint(1, 60)
            for _ in range(m):
                a, b = rng.randrange(n), rng.randrange(n)
                edges.append((base + a, base + b))

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a: int, b: int) -> None:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        for a, b in edges:
            union(a, b)
        want = {x: find(x) for x in parent}

        df = spark.createDataFrame(edges, "a long, b long")
        got = {r["node"]: r["component"]
               for r in connected_components(df).collect()}
        assert got == want


class TestTimezoneProofing:
    def test_gc_ts_min_invariant_under_session_tz(self, spark):
        """The ADVICE scenario: a non-UTC caller session must produce
        identical minute buckets — the instant-timestamp path goes
        through unix_micros, never a tz-dependent NTZ cast."""
        from pyspark.sql import functions as F

        from astra_perseverance_spark.conformed.model import build_gc_event

        def epochs(sess):
            # compare raw epoch seconds, not collected datetimes —
            # collect() localizes to the session tz, which could
            # cancel an NTZ-cast bug and hide the shift
            df = build_gc_event(sess, "/root/testdata/sf0.001")
            return {
                (r["node"], r["ep"], r["pause_ms"])
                for r in df.select(
                    "node", F.unix_seconds("ts").alias("ep"), "pause_ms"
                ).collect()
            }

        utc = epochs(spark)
        other = spark.newSession()
        other.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            got = epochs(other)
        finally:
            other.conf.set("spark.sql.session.timeZone", "UTC")
        assert got == utc


class TestTuneSession:
    def test_disabled_aqe_is_respected(self, spark):
        """The ADVICE scenario: a harness that deliberately disabled AQE
        must not have it silently re-enabled by the first query call."""
        from astra_perseverance_spark.conformed.model import _tune_session

        sess = spark.newSession()
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        sess.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false")
        try:
            _tune_session(sess)
            assert sess.conf.get("spark.sql.adaptive.enabled") == "false"
            assert sess.conf.get(
                "spark.sql.adaptive.coalescePartitions.enabled") == "false"
        finally:
            sess.conf.set("spark.sql.adaptive.enabled", "true")
            sess.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled", "true")

    def test_nondefault_shuffle_partitions_untouched(self, spark):
        from astra_perseverance_spark.conformed.model import _tune_session

        sess = spark.newSession()
        sess.conf.set("spark.sql.shuffle.partitions", "7")
        _tune_session(sess)
        assert sess.conf.get("spark.sql.shuffle.partitions") == "7"

    def test_default_session_gets_tuned(self, spark):
        from astra_perseverance_spark.conformed.model import _tune_session

        sess = spark.newSession()
        sess.conf.set("spark.sql.shuffle.partitions", "200")  # Spark default
        _tune_session(sess)
        assert sess.conf.get("spark.sql.shuffle.partitions") != "200"
        assert sess.conf.get("spark.sql.adaptive.enabled") == "true"

    def test_locked_static_conf_does_not_raise(self, spark):
        """A CANNOT_MODIFY_CONFIG AnalysisException from a locked knob is
        a caller choice — tuning must skip quietly, not crash or mask
        unrelated errors."""
        from astra_perseverance_spark.conformed import model as m

        class LockedConf:
            def get(self, k):
                return "200" if k.endswith("shuffle.partitions") else "true"

            def set(self, k, v):
                from pyspark.errors import AnalysisException

                raise AnalysisException(
                    f"[CANNOT_MODIFY_CONFIG] Cannot modify the value of "
                    f"the Spark config: {k}")

        class FakeSession:
            conf = LockedConf()
            sparkContext = spark.sparkContext

        m._tune_session(FakeSession())  # must not raise


class TestSizingFormulaParity:
    """The driver-side sizing scalars (plane count, IVF stride) are
    mirrored as SQL in the oracle twins; the two formulas must agree
    on every cardinality, not just the test corpora."""

    from hypothesis import given, settings, strategies as st

    @given(st.integers(min_value=1, max_value=10**12))
    @settings(max_examples=200, deadline=None)
    def test_plane_count_matches_sql(self, n):
        import duckdb

        from astra_perseverance_spark.functions.vectors import (
            plane_count,
            plane_count_sql,
        )

        got = duckdb.sql(
            f"SELECT {plane_count_sql(str(n))}").fetchone()[0]
        assert got == plane_count(n)

    @given(st.integers(min_value=1, max_value=2**50))
    @settings(max_examples=200, deadline=None)
    def test_ivf_stride_matches_sql(self, n):
        import duckdb

        from astra_perseverance_spark.extensions.similarity import (
            IVF_MAX_LISTS,
            ivf_stride,
        )

        got = duckdb.sql(
            f"SELECT greatest(1, {n} // greatest("
            f"least(CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT), "
            f"{IVF_MAX_LISTS}), 1))").fetchone()[0]
        assert got == ivf_stride(n)


class TestSqlViews:
    def test_conformed_views_queryable(self, spark):
        from astra_perseverance_spark.conformed.model import (
            register_sql_views,
        )
        from tests.conftest import SF_SMALL

        names = register_sql_views(spark, SF_SMALL)
        assert {"node_info", "cfstats_metric", "gc_event",
                "documents"} <= set(names)
        # an ad-hoc analyst query over two conformed views
        row = spark.sql("""
            SELECT COUNT(DISTINCT n.node) AS nodes,
                   (SELECT COUNT(*) FROM gc_event) AS gc_events
            FROM node_info n
        """).collect()[0]
        assert row["nodes"] > 0 and row["gc_events"] > 0
        assert spark.sql(
            "SELECT COUNT(*) AS c FROM documents").collect()[0]["c"] > 0


class TestBpeRoundSql:
    """The shipped BPE round CTE (oracle/ext_sqls._bpe_round_sql) must
    implement greedy LEFTMOST NON-OVERLAPPING merging — the
    even-offset-within-run window rule — for any word set, including
    the equal-symbol runs ('aaa') where overlap handling is subtle.
    Exercised through DuckDB against a pure-Python reference."""

    @settings(max_examples=60, deadline=None)
    @given(
        words=st.lists(
            st.tuples(
                st.text(alphabet="ab", min_size=1, max_size=12),
                st.integers(min_value=1, max_value=5),
            ),
            min_size=1, max_size=6,
            unique_by=lambda t: t[0],
        )
    )
    def test_one_round_matches_python_greedy(self, words):
        from collections import Counter

        from astra_perseverance_spark.oracle.ext_sqls import _bpe_round_sql

        # python reference: argmax pair then greedy leftmost merge
        pairs: Counter = Counter()
        for w, n in words:
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] += n
        if not pairs:
            return
        (left, right), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect = set()
        for w, n in words:
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == left and w[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            for p, sym in enumerate(out):
                expect.add((w, p, sym))

        values = ", ".join(f"('{w}', {n})" for w, n in words)
        round_sql, best_cte, rows_cte = _bpe_round_sql("br0", 1)
        con = duckdb.connect()
        got = set(con.execute(f"""
WITH br0 AS MATERIALIZED (
  SELECT word, CAST(n AS BIGINT) AS n, CAST(u.p AS BIGINT) AS p,
         substr(word, CAST(u.p + 1 AS INT), 1) AS sym
  FROM (VALUES {values}) AS t(word, n), unnest(range(length(word))) AS u(p)
),
{round_sql}
SELECT word, CAST(p AS INT), sym FROM {rows_cte} ORDER BY word, p
""").fetchall())
        chosen = con.execute(f"""
WITH br0 AS MATERIALIZED (
  SELECT word, CAST(n AS BIGINT) AS n, CAST(u.p AS BIGINT) AS p,
         substr(word, CAST(u.p + 1 AS INT), 1) AS sym
  FROM (VALUES {values}) AS t(word, n), unnest(range(length(word))) AS u(p)
),
{round_sql}
SELECT lsym, rsym FROM {best_cte}
""").fetchall()
        assert chosen == [(left, right)]
        assert got == expect


class TestSourceCrossDupOracleProperty:
    """Property test for the exact-pairs arithmetic of the shipped
    ``source_cross_dup`` oracle: on random corpora of SHORT texts
    (under 3 tokens, so the 3-gram shingle universe is empty and
    near_pairs is provably 0) the oracle must equal a brute force
    that MATERIALIZES every within-digest-group C(k,2) pair and
    tallies it per unordered source pair — exactly the formulation
    the operator's composition arithmetic avoids at scale.  The
    Spark side is pinned to this oracle by the hash-parity gate, so
    this transitively fuzzes the operator's pair counting."""

    @settings(max_examples=40, deadline=None)
    @given(
        corpus=st.lists(
            st.tuples(
                st.sampled_from(["x", "y y", "z", "w  w", ""]),
                st.sampled_from(["s1", "s2", "s3"]),
            ),
            min_size=1, max_size=12,
        )
    )
    def test_oracle_matches_pair_materialization(self, corpus):
        import itertools
        import re
        from collections import Counter

        from astra_perseverance_spark.oracle import ORACLE_SQL

        docs = [(i, t, s) for i, (t, s) in enumerate(corpus)]

        def norm(t: str) -> str:
            return re.sub(r"\s+", " ", t.lower().strip())

        groups: dict[str, list] = {}
        for d, t, s in docs:
            groups.setdefault(norm(t), []).append((d, s))
        tally: Counter = Counter()
        for members in groups.values():
            for (_, s1), (_, s2) in itertools.combinations(members, 2):
                tally[tuple(sorted((s1, s2)))] += 1
        expect = {(a, b, n, 0) for (a, b), n in tally.items() if n > 0}

        values = ", ".join(
            f"({d}, '{t}', 'en', '{s}')" for d, t, s in docs)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM (VALUES {values}) "
            f"AS t(doc_id, text, lang, source)"
        )
        got = set(con.execute(ORACLE_SQL["source_cross_dup"]).fetchall())
        assert got == expect


class TestSpanTrimOracleProperty:
    """Property test for the shipped ``dedup_span_trim`` oracle SQL:
    on random tiny-alphabet corpora (collisions forced, so duplicate
    windows actually occur) the oracle must equal a direct Python
    brute force of the declared semantics — gram homes, min-doc
    first occurrence, per-position coverage, reassembly.  The Spark
    side is pinned to this same oracle by the hash-parity gate, so
    this transitively fuzzes the operator's semantics without a
    Spark session per example."""

    @settings(max_examples=40, deadline=None)
    @given(
        corpus=st.lists(
            st.lists(st.sampled_from(["a", "b", "c"]),
                     min_size=0, max_size=14),
            min_size=1, max_size=7,
        )
    )
    def test_oracle_matches_bruteforce(self, corpus):
        from astra_perseverance_spark.extensions.training import (
            DUP_SPAN_MIN_DOCS,
            DUP_SPAN_W,
        )
        from astra_perseverance_spark.oracle import ORACLE_SQL

        assert DUP_SPAN_MIN_DOCS == 2
        W = DUP_SPAN_W
        docs = {i: toks for i, toks in enumerate(corpus)}

        homes: dict[str, set[int]] = {}
        for d, t in docs.items():
            for p in range(len(t) - W + 1):
                homes.setdefault(" ".join(t[p:p + W]), set()).add(d)
        rep = {g: min(s) for g, s in homes.items() if len(s) >= 2}
        expect = set()
        for d, t in docs.items():
            cov: set[int] = set()
            for p in range(len(t) - W + 1):
                g = " ".join(t[p:p + W])
                if g in rep and rep[g] != d:
                    cov.update(range(p, p + W))
            kept = [tok for i, tok in enumerate(t) if i not in cov]
            expect.add((d, len(t), len(t) - len(kept), len(kept),
                        " ".join(kept)))

        values = ", ".join(
            f"({d}, '{' '.join(t)}', 'en', 's')" for d, t in docs.items()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM (VALUES {values}) "
            f"AS t(doc_id, text, lang, source)"
        )
        got = set(con.execute(ORACLE_SQL["dedup_span_trim"]).fetchall())
        assert got == expect
