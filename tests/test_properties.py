"""Property tests (SURVEY §5.2.4): round-trips and complementarity,
evaluated as single vectorized Spark jobs over generated input grids."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dcafs_spark.functions.compare import compile_compare, compile_compare_py
from dcafs_spark.functions.checksum import nmea_checksum, nmea_checksum_ok
from dcafs_spark.functions.geo import gdc_from_utm, utm_from_gdc
from dcafs_spark.functions.timefn import redate
from dcafs_spark.operators.editor_forward import Edit, EditorForward
from dcafs_spark.operators.filter_forward import FilterForward


class TestUtmRoundtrip:
    def test_gdc_utm_gdc_within_tenth_meter(self, spark):
        rng = random.Random(7)
        pts = [
            (i, rng.uniform(-80, 84), rng.uniform(-179.9, 179.9)) for i in range(300)
        ]
        df = spark.createDataFrame(pts, "i int, lat double, lon double")
        utm = utm_from_gdc(F.col("lat"), F.col("lon"))
        # self-contained inverse: the hemisphere flag comes from the
        # forward output's own struct, not the original latitude —
        # proving a UTM struct alone is invertible (round-11 fix)
        back = gdc_from_utm(utm["easting"], utm["northing"], utm["zone"], southern=utm["southern"])
        bad = df.select(
            (F.abs(back["lat"] - F.col("lat")) > 1e-6).alias("dlat"),
            (F.abs(back["lon"] - F.col("lon")) > 1e-6).alias("dlon"),
        ).filter(F.col("dlat") | F.col("dlon"))
        assert bad.count() == 0  # 1e-6 deg ≈ 0.1 m

    def test_utm_sanity_known_point(self, spark):
        # Zeebrugge-ish: 51.33N 3.20E → zone 31
        df = spark.createDataFrame([(51.33, 3.20)], "lat double, lon double")
        u = df.select(utm_from_gdc(F.col("lat"), F.col("lon")).alias("u")).first()["u"]
        assert u["zone"] == 31
        assert u["easting"] == pytest.approx(513930, abs=2000)
        assert u["northing"] == pytest.approx(5686860, abs=2000)


class TestRedateRoundtrip:
    def test_format_roundtrip_identity(self, spark):
        rng = random.Random(11)
        rows = [
            (i, f"{rng.randrange(2000, 2030):04d}-{rng.randrange(1, 13):02d}-{rng.randrange(1, 29):02d} "
                f"{rng.randrange(24):02d}:{rng.randrange(60):02d}:{rng.randrange(60):02d}")
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "i int, s string")
        there = redate(F.col("s"), "yyyy-MM-dd HH:mm:ss", "dd/MM/yyyy HH.mm.ss")
        back = redate(there, "dd/MM/yyyy HH.mm.ss", "yyyy-MM-dd HH:mm:ss")
        assert df.filter(back != F.col("s")).count() == 0


class TestNmeaRoundtrip:
    def test_append_then_verify(self, spark):
        rng = random.Random(3)
        bodies = [
            (i, "GPZDA," + "".join(rng.choice("ABCDEFGH0123456789,") for _ in range(20)))
            for i in range(200)
        ]
        df = spark.createDataFrame(bodies, "i int, body string")
        full = F.concat(F.lit("$"), F.col("body"), F.lit("*"), nmea_checksum(F.col("body")))
        ok = df.select(nmea_checksum_ok(full).alias("ok"))
        assert ok.filter(~F.col("ok")).count() == 0

    def test_corruption_detected(self, spark):
        df = spark.createDataFrame([("GPZDA,160012.00,11,07",)], "body string")
        full = F.concat(F.lit("$"), F.col("body"), F.lit("*"), nmea_checksum(F.col("body")))
        # flip one payload char AFTER checksumming
        corrupted = F.regexp_replace(full, "GPZDA", "GPZDB")
        row = df.select(
            nmea_checksum_ok(full).alias("ok"), nmea_checksum_ok(corrupted).alias("bad")
        ).first()
        assert row["ok"] is True and row["bad"] is False


class TestFilterComplementarity:
    def test_fork_partitions_exactly(self, spark, lines_df):
        ff = FilterForward(rules=[("start", "$CTD"), ("minitems", "6")], delimiter=",")
        acc, rej = ff.fork(lines_df)
        total = lines_df.count()
        assert acc.count() + rej.count() == total
        assert acc.intersect(rej).count() == 0
        # negate swaps the fork
        neg = FilterForward(rules=[("start", "$CTD"), ("minitems", "6")], delimiter=",", negate=True)
        assert neg.apply(lines_df).count() == rej.count()


class TestResplitIdentity:
    def test_full_template_is_identity(self, spark):
        rows = [(i, f"a{i},b{i},c{i}") for i in range(50)]
        df = spark.createDataFrame(rows, "i int, value string")
        ed = EditorForward(edits=[Edit("resplit", {"template": "i0,i1,i2"})])
        out = ed.apply(df).collect()
        assert len(out) == 50
        assert all(r["value"] == f"a{r['i']},b{r['i']},c{r['i']}" for r in out)


class TestCompareGrammarConsistency:
    SPECS = [
        "above 5", "below 5", "not above 5", "at least 5", "equals 5", "not 5",
        "between 2 and 8", "not between 2 and 8", "from 2 to 8", "2 through 8",
        "<= 5", ">5", "2-8", "1<x<9",
    ]

    def test_python_and_column_agree(self, spark):
        vals = [float(v) for v in range(-2, 12)] + [2.5, 7.999, 8.0]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        for spec in self.SPECS:
            col_pred = compile_compare(spec)(F.col("v"))
            spark_true = {r["v"] for r in df.filter(col_pred).collect()}
            py = compile_compare_py(spec)
            py_true = {v for v in vals if py(v)}
            assert spark_true == py_true, f"grammar mismatch for {spec!r}"


class TestMathfabFuzz:
    def test_random_formulas_match_python(self, spark):
        """Fuzz the formula compiler: random arithmetic over i0..i2
        evaluated by Catalyst must match Python's own arithmetic.
        One job: every formula is a column over the same input rows."""
        import operator

        from dcafs_spark.functions.mathfab import compile_math

        rng = random.Random(42)
        ops = [("+", operator.add), ("-", operator.sub), ("*", operator.mul), ("/", operator.truediv)]

        def gen(depth=0):
            if depth >= 2 or rng.random() < 0.4:
                if rng.random() < 0.5:
                    k = rng.randrange(3)
                    return f"i{k}", lambda f, k=k: f[k]
                v = round(rng.uniform(0.5, 9.5), 2)
                return repr(v), lambda f, v=v: v
            sym, fn = rng.choice(ops)
            ls, lf = gen(depth + 1)
            rs, rf = gen(depth + 1)
            return f"({ls} {sym} {rs})", lambda f, fn=fn, lf=lf, rf=rf: fn(lf(f), rf(f))

        formulas = [gen() for _ in range(40)]
        rows = [(rng.uniform(1.0, 50.0), rng.uniform(1.0, 50.0), rng.uniform(1.0, 50.0)) for _ in range(20)]
        df = spark.createDataFrame(rows, "f0 double, f1 double, f2 double")
        cols = [
            compile_math(src).column(fields=lambda k: F.col(f"f{k}")).alias(f"e{i}")
            for i, (src, _fn) in enumerate(formulas)
        ]
        got = df.select(*[F.col(c) for c in df.columns], *cols).collect()
        for r in got:
            fields = (r["f0"], r["f1"], r["f2"])
            for i, (_src, fn) in enumerate(formulas):
                expected = fn(fields)
                assert r[f"e{i}"] == pytest.approx(expected, rel=1e-12), formulas[i][0]


class TestFieldsFromTable:
    def test_infer_generic_mapping(self, spark, tmp_path):
        import sqlite3

        from dcafs_spark.operators.projection import Generic
        from dcafs_spark.sinks.db import fields_from_table

        db = str(tmp_path / "m.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE ctd (station TEXT, temp REAL, depth INTEGER, ok BOOLEAN)")
        con.commit(); con.close()
        fields = fields_from_table(db, "ctd")
        assert [(f.name, f.dtype, f.index) for f in fields] == [
            ("station", "text", 0), ("temp", "real", 1), ("depth", "integer", 2), ("ok", "flag", 3),
        ]
        # the inferred mapping parses a line end-to-end
        df = spark.createDataFrame([("st1,12.5,100,true",)], "value string")
        row = Generic(fields=fields).apply(df).first()
        assert (row["station"], row["temp"], row["depth"], row["ok"]) == ("st1", 12.5, 100, True)


class TestFilterRuleProperties:
    """Property test: every FilterForward rule agrees with a plain
    python evaluation of the same rule over random delimited lines
    (the reference's FilterForward.java:315-379 semantics)."""

    def _py_eval(self, rtype, value, line, delim):
        if rtype == "start":
            return any(line.startswith(o) for o in value.split(","))
        if rtype == "nostart":
            return not any(line.startswith(o) for o in value.split(","))
        if rtype == "end":
            return line.endswith(value)
        if rtype == "contain":
            return any(o in line for o in value.split(","))
        if rtype == "minlength":
            return len(line) >= int(value)
        if rtype == "maxlength":
            return len(line) <= int(value)
        if rtype == "minitems":
            return len(line.split(delim)) >= int(value)
        if rtype == "maxitems":
            return len(line.split(delim)) <= int(value)
        if rtype == "items":
            return len(line.split(delim)) == int(value)
        if rtype == "c_start":
            pos, ch = value.split(",", 1)
            return len(line) >= int(pos) and line[int(pos) - 1] == ch
        raise AssertionError(rtype)

    def test_rules_match_python_reference(self, spark):
        import random

        from dcafs_spark.operators.filter_forward import FilterForward

        rnd = random.Random(99)
        alphabet = "$ABC,12;x"
        lines = ["".join(rnd.choice(alphabet) for _ in range(rnd.randrange(0, 14))) for _ in range(300)]
        rules = [
            ("start", "$A,$B"),
            ("nostart", "$"),
            ("end", "2"),
            ("contain", "BC,1"),
            ("minlength", "5"),
            ("maxlength", "8"),
            ("minitems", "3"),
            ("maxitems", "2"),
            ("items", "2"),
            ("c_start", "2,A"),
        ]
        df = spark.createDataFrame([(ln,) for ln in lines], "value string")
        for rtype, value in rules:
            ff = FilterForward(rules=[(rtype, value)], delimiter=",")
            got = {r["value"] for r in ff.apply(df).collect()}
            # multiset semantics: compare per-line keep decisions
            want = [ln for ln in lines if self._py_eval(rtype, value, ln, ",")]
            assert sorted(got) == sorted(set(want)), f"rule {rtype}:{value}"
            # negate inverts exactly
            neg = FilterForward(rules=[(rtype, value)], delimiter=",", negate=True)
            got_n = [r["value"] for r in neg.apply(df).collect()]
            assert len(got_n) == len(lines) - len(want), f"negate {rtype}"


class TestEditorChainFuzz:
    """Random edit chains agree with a pure-python reference
    implementation of the dispatch semantics (EditorForward.java
    :191-287) over random lines — the editor analogue of the mathfab
    formula fuzz."""

    @staticmethod
    def _py_edit(line, kind, a, delim):
        if line is None:
            return None
        if kind == "replace":
            return line.replace(a["find"], a["replacement"])
        if kind == "remove":
            return line.replace(a["find"], "")
        if kind == "trim":
            return line.strip()
        if kind == "prepend":
            return a["text"] + line
        if kind == "append":
            return line + a["text"]
        if kind == "insert":
            p = a["position"]
            return line[:p] + a["text"] + line[p:]
        if kind == "cutstart":
            return line[a["count"]:] if len(line) >= a["count"] else None
        if kind == "cutend":
            return line[: len(line) - a["count"]] if len(line) >= a["count"] else None
        if kind == "charsplit":
            bounds = [0, *a["positions"]]
            pieces = [
                line[b : a["positions"][i]] if i < len(a["positions"]) else line[b:]
                for i, b in enumerate(bounds)
            ]
            return delim.join(pieces)
        raise AssertionError(kind)

    def test_random_chains_match(self, spark):
        import random

        from dcafs_spark.operators.editor_forward import Edit, EditorForward

        rnd = random.Random(4242)
        alphabet = "ab,:1 $"
        kinds = ["replace", "remove", "trim", "prepend", "append", "insert", "cutstart", "cutend", "charsplit"]

        def rand_args(kind):
            if kind == "replace":
                return {"find": rnd.choice("ab,1"), "replacement": rnd.choice("xy")}
            if kind == "remove":
                return {"find": rnd.choice("ab,1")}
            if kind in ("prepend", "append"):
                return {"text": rnd.choice(["T:", "#", " z"])}
            if kind == "insert":
                return {"position": rnd.randrange(0, 4), "text": "!"}
            if kind in ("cutstart", "cutend"):
                return {"count": rnd.randrange(1, 4)}
            if kind == "charsplit":
                return {"positions": sorted(rnd.sample(range(1, 8), 2))}
            return {}

        lines = ["".join(rnd.choice(alphabet) for _ in range(rnd.randrange(0, 14))) for _ in range(60)]
        df = spark.createDataFrame([(i, ln) for i, ln in enumerate(lines)], "i int, value string")

        for _trial in range(12):
            chain = [(k, rand_args(k)) for k in (rnd.choice(kinds) for _ in range(rnd.randrange(1, 5)))]
            ed = EditorForward(edits=[Edit(k, dict(a)) for k, a in chain], delimiter=",")
            got = {r["i"]: r["value"] for r in ed.apply(df).collect()}
            for i, ln in enumerate(lines):
                want = ln
                for k, a in chain:
                    want = self._py_edit(want, k, a, ",")
                    if want is None:
                        break
                if want is None:
                    assert i not in got, f"row {i} should be dropped by {chain}"
                else:
                    assert got.get(i) == want, f"{chain} on {ln!r}: {got.get(i)!r} != {want!r}"


class TestGenericProjectionFuzz:
    """Random delimited lines through Generic typed parsing agree with
    a python reference (split/try-parse/default — Generic.java:189-337)."""

    def test_random_lines(self, spark):
        import random

        from dcafs_spark.operators.projection import Field, Generic

        rnd = random.Random(777)
        tokens = ["1", "2.5", "-3", "x", "", "1e2", " 7 ", "NaN", "true", "9999999999"]
        lines = [",".join(rnd.choice(tokens) for _ in range(rnd.randrange(0, 6))) for _ in range(200)]
        df = spark.createDataFrame([(i, ln) for i, ln in enumerate(lines)], "i int, value string")

        g = Generic(
            fields=[
                Field("a", 0, "real", default=-1.0),
                Field("b", 1, "integer", default=0),
                Field("c", 2, "text"),
                Field("d", 3, "long", default=-9),
            ],
            delimiter=",",
        )
        out = {r["i"]: (r["a"], r["b"], r["c"], r["d"]) for r in g.apply(df, keep=["i"]).collect()}

        def parse_real(s, default):
            try:
                v = float(s.strip())
                return v
            except (ValueError, AttributeError):
                return default

        def parse_int(s, default, lo=-2**31, hi=2**31 - 1):
            s = (s or "").strip()
            try:
                v = int(s)
                return v if lo <= v <= hi else default
            except ValueError:
                return default

        for i, ln in enumerate(lines):
            parts = ln.split(",")
            want_a = parse_real(parts[0] if len(parts) > 0 else None, -1.0)
            want_b = parse_int(parts[1] if len(parts) > 1 else None, 0)
            want_c = parts[2] if len(parts) > 2 else None
            want_d = parse_int(parts[3] if len(parts) > 3 else None, -9, -2**63, 2**63 - 1)
            got_a, got_b, got_c, got_d = out[i]
            if want_a != want_a:  # NaN
                assert got_a != got_a
            else:
                assert got_a == want_a, f"row {i} {ln!r} a: {got_a} != {want_a}"
            assert got_b == want_b, f"row {i} {ln!r} b: {got_b} != {want_b}"
            assert got_c == want_c, f"row {i} {ln!r} c: {got_c!r} != {want_c!r}"
            assert got_d == want_d, f"row {i} {ln!r} d: {got_d} != {want_d}"


class TestValMapFuzz:
    """Random multi-record key:value lines through valmap agree with a
    python reference (ValMap.java:41-75 split semantics)."""

    def test_random_kv_lines(self, spark):
        import random

        from dcafs_spark.operators.projection import valmap

        rnd = random.Random(31337)
        keys = ["t", "sal", "x1", ""]
        vals = ["1", "2.5", "", "a:b", "z"]

        def record():
            if rnd.random() < 0.15:
                return rnd.choice(["bare", "", "nocolonhere"])
            return f"{rnd.choice(keys)}:{rnd.choice(vals)}"

        lines = [";".join(record() for _ in range(rnd.randrange(1, 4))) for _ in range(150)]
        df = spark.createDataFrame([(i, ln) for i, ln in enumerate(lines)], "i int, value string")
        got = [
            (r["i"], r["key"], r["value"])
            for r in valmap(df, split=":", multi_delimiter=";").select("i", "key", "value").collect()
        ]

        # java String.split reference: trailing empty strings removed,
        # exactly-2-part records accepted, everything else dropped
        # (ValMap.java:49-60 — len>2 logs an error and returns, len==1
        # only reaches the empty-key mapping, never emits a pair)
        want = []
        for i, ln in enumerate(lines):
            for rec in ln.split(";"):
                parts = rec.rstrip(":").split(":") if rec.rstrip(":") else []
                if len(parts) == 2:
                    want.append((i, parts[0], parts[1]))
        assert sorted(got, key=str) == sorted(want, key=str)


class TestConnectedComponentsFuzz:
    """Random graphs vs an independent pure-python union-find."""

    @staticmethod
    def _union_find(edges):
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical: every node -> min id of its component
        comp: dict = {}
        for n in parent:
            comp.setdefault(find(n), []).append(n)
        return {n: min(ns) for r, ns in comp.items() for n in ns}

    def test_random_graphs_match_union_find(self, spark):
        import random

        from dcafs_spark.operators.dedup import connected_components

        rng = random.Random(424242)
        for trial in range(6):
            n_nodes = rng.randint(2, 60)
            n_edges = rng.randint(1, 80)
            edges = [
                (rng.randint(0, n_nodes), rng.randint(0, n_nodes)) for _ in range(n_edges)
            ]
            # self-loops allowed: a doc paired with itself must be harmless
            expect = self._union_find(edges)
            df = spark.createDataFrame(edges, "id_a long, id_b long")
            got = {r["node"]: r["cluster"] for r in connected_components(df).collect()}
            assert got == expect, f"trial {trial}: {sorted(edges)}"


class TestEmbeddingOpProperties:
    def test_quantize_matches_numpy_reference(self, spark):
        """Random vectors (including negatives, zeros, tiny/huge
        magnitudes): Spark int8 summaries == a numpy reference."""
        import numpy as np

        from dcafs_spark.operators.embedding_ops import quantize_int8

        rng = random.Random(23)
        rows = []
        for i in range(60):
            scale = 10.0 ** rng.randrange(-3, 4)
            vec = [rng.uniform(-scale, scale) for _ in range(16)]
            if i % 7 == 0:
                vec[rng.randrange(16)] = 0.0
            rows.append((i, [float(np.float32(x)) for x in vec]))
        df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
        got = {r["vec_id"]: r.asDict() for r in quantize_int8(df).collect()}
        for vid, vec in rows:
            v = np.array([np.float32(x) for x in vec], dtype=np.float64)
            maxabs = float(np.abs(v).max())
            s = 127.0 / maxabs if maxabs > 0 else 1.0
            q = np.floor(np.abs(v * s) + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)
            r = got[vid]
            assert r["q_sum"] == int(q.sum()), vid
            assert r["q_sq_sum"] == int((q * q).sum()), vid
            assert r["q_nnz"] == int((q != 0).sum()), vid
            assert -127 <= r["q_min"] and r["q_max"] <= 127

    def test_projection_is_linear(self, spark):
        """P(a·x) == a·P(x) within fp tolerance — the defining property
        of the JL map (catches any accidental nonlinearity/bias)."""
        from dcafs_spark.operators.embedding_ops import random_projection

        rng = random.Random(5)
        base = [rng.uniform(-1, 1) for _ in range(64)]
        df = spark.createDataFrame(
            [(1, base), (2, [3.0 * x for x in base])],
            "vec_id int, embedding array<double>",
        )
        out = {r["vec_id"]: [r[f"p{j}"] for j in range(8)] for r in random_projection(df).collect()}
        for a, b in zip(out[1], out[2]):
            assert abs(3.0 * a - b) < 1e-4
