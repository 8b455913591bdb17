"""XML settings → path spec parsing (plans/xmlconfig.py) and the
compiled pipeline's behavior against hand-computed expectations."""

import pytest

from dcafs_spark.plans.xmlconfig import load_paths


FULL_XML = """
<dcafs>
  <paths>
    <path id="sbe38" delimiter=";">
      <filter negate="false" ignores="2">
        <rule type="start">$GPGGA</rule>
        <rule type="start">$GPGLL</rule>
        <rule type="minlength">10</rule>
      </filter>
      <math suffix="">
        <def ref="KNOT">0.5144444</def>
        <op type="complex" scale="3">i1=i1*KNOT</op>
        <op type="salinity" index="4">i1,i2,i3</op>
      </math>
      <editor>
        <edit type="redate" from="yy:dd:MM">dd_MM_yy</edit>
        <edit type="replace" find="a">b</edit>
        <edit type="prepend">T:</edit>
        <edit type="insert" position="2">!</edit>
        <edit type="cutend">1</edit>
        <edit type="listreplace" first="1">cat,dog</edit>
      </editor>
      <generic delimiter="," startswith="$" keep="origin">
        <text index="0">name</text>
        <real index="2" def="0.0">speed</real>
        <integer index="3">count</integer>
        <flag index="4">ok</flag>
      </generic>
      <valmap split=":" multi=";"/>
    </path>
    <path id="second" delimiter=","><filter type="contain">x</filter></path>
  </paths>
</dcafs>
"""


class TestXmlParsing:
    def test_two_paths_found(self):
        specs = load_paths(FULL_XML)
        assert set(specs) == {"sbe38", "second"}
        assert specs["sbe38"]["delimiter"] == ";"

    def test_filter_rules_with_multi_start(self):
        f = load_paths(FULL_XML)["sbe38"]["steps"][0]
        assert f["type"] == "filter"
        # two start rules OR-combine into one multi-option rule
        assert ["start", "$GPGGA,$GPGLL"] in f["rules"]
        assert ["minlength", "10"] in f["rules"]
        assert f["ignores"] == 2

    def test_single_rule_filter_on_element(self):
        f = load_paths(FULL_XML)["second"]["steps"][0]
        assert f["rules"] == [["contain", "x"]]

    def test_math_defs_and_ops(self):
        m = load_paths(FULL_XML)["sbe38"]["steps"][1]
        assert m["consts"] == {"KNOT": 0.5144444}
        assert m["ops"][0] == {"target": "i1", "formula": "i1*KNOT", "scale": 3}
        assert m["ops"][1] == {"target": "i4", "formula": "i1,i2,i3", "special": "salinity"}

    def test_editor_edits(self):
        e = load_paths(FULL_XML)["sbe38"]["steps"][2]
        kinds = [d["kind"] for d in e["edits"]]
        assert kinds == ["redate", "replace", "prepend", "insert", "cutend", "listreplace"]
        assert e["edits"][0]["args"] == {"from": "yy:dd:MM", "to": "dd_MM_yy"}
        assert e["edits"][1]["args"] == {"find": "a", "replacement": "b"}
        assert e["edits"][3]["args"] == {"position": 2, "text": "!"}
        assert e["edits"][5]["args"] == {"first": 1, "list": ["cat", "dog"]}

    def test_generic_fields(self):
        g = load_paths(FULL_XML)["sbe38"]["steps"][3]
        assert g["delimiter"] == ","
        assert g["startswith"] == "$"
        assert g["keep"] == ["origin"]
        assert g["fields"][0] == {"name": "name", "index": 0, "dtype": "text"}
        assert g["fields"][1] == {"name": "speed", "index": 2, "dtype": "real", "default": 0.0}
        assert g["fields"][3] == {"name": "ok", "index": 4, "dtype": "flag"}

    def test_valmap(self):
        v = load_paths(FULL_XML)["sbe38"]["steps"][4]
        assert v == {"type": "valmap", "split": ":", "multi": ";"}

    def test_bare_path_element(self):
        specs = load_paths('<path id="p1" delimiter=","><filter type="start">$</filter></path>')
        assert specs["p1"]["steps"][0]["rules"] == [["start", "$"]]

    def test_special_xml_escapes(self):
        specs = load_paths(
            '<path id="p"><editor><edit type="prepend">{0x3C}b{0x3E}</edit></editor></path>'
        )
        assert specs["p"]["steps"][0]["edits"][0]["args"]["text"] == "<b>"

    def test_unknown_step_raises(self):
        with pytest.raises(ValueError, match="unknown path step"):
            load_paths('<path id="p"><bogus/></path>')

    def test_unknown_edit_raises(self):
        with pytest.raises(ValueError, match="unknown edit type"):
            load_paths('<path id="p"><editor><edit type="nope">x</edit></editor></path>')


class TestXmlCompiled:
    def test_xml_path_end_to_end(self, spark):  # noqa: F811
        from dcafs_spark.plans import compile_path

        xml = """
        <path id="t" delimiter=",">
          <filter><rule type="start">$T</rule><rule type="minitems">3</rule></filter>
          <math><op>i1=i1*2</op></math>
          <generic keep="line_id">
            <real index="1">doubled</real>
            <text index="2">tag</text>
          </generic>
        </path>
        """
        df = spark.createDataFrame(
            [(1, "$T,1.5,a"), (2, "$T,2.0,b"), (3, "XX,9.9,c"), (4, "$T,0.25,d")],
            "line_id int, value string",
        )
        spec = load_paths(xml)["t"]
        out, _ = compile_path(df, spec)
        rows = {r["line_id"]: (r["doubled"], r["tag"]) for r in out.collect()}
        assert rows == {1: (3.0, "a"), 2: (4.0, "b"), 4: (0.5, "d")}

    def test_reject_route(self, spark):  # noqa: F811
        from dcafs_spark.plans import compile_path

        xml = """
        <path id="t" delimiter=",">
          <filter reject="bad"><rule type="start">$</rule></filter>
        </path>
        """
        df = spark.createDataFrame([("$ok",), ("no",)], "value string")
        out, rejects = compile_path(df, load_paths(xml)["t"])
        assert out.count() == 1
        assert rejects["bad"].count() == 1


MANUAL_DAS_XML = """
<das>
  <settings>
    <databases>
      <sqlite id="navdata" path="db/navdata.sqlite">
        <table name="gps">
          <text alias="timestamp">timestamp</text>
          <real alias="">fixtime</real>
          <real alias="">latitude</real>
          <real alias="">longitude</real>
        </table>
      </sqlite>
    </databases>
  </settings>
  <streams>
    <stream id="gps" type="tcp">
      <address>192.168.17.203:2101</address>
      <eol>crlf</eol>
    </stream>
  </streams>
  <filters>
    <filter id="zda" src="raw:id:gps" type="start">$GPZDA</filter>
    <filter id="gga" src="raw:id:gps" type="start">$GPGGA</filter>
  </filters>
  <editors>
    <editor delimiter="," id="zda" src="filter:zda" label="generic:zda">
      <edit delimiter="," leftover="append" type="resplit">i0,i4-i3-i2 i1</edit>
      <edit delimiter="," from="yyyy-MM-dd HHmmss.SS" index="1" type="redate">yyyy-MM-dd HH:mm:ss.SSS</edit>
    </editor>
  </editors>
  <maths>
    <math delimiter="," id="gga" src="filter:gga" label="generic:gga">
      <op index="2">(i2-(i2%100))/100+(i2%100)/60</op>
      <op index="4">(i4-(i4%100))/100+(i4%100)/60</op>
    </math>
  </maths>
  <generics>
    <generic delimiter="," id="zda">
      <text index="1">timestamp</text>
    </generic>
    <generic id="gga" dbid="navdata" delimiter="," table="gps">
      <real index="1">fixtime</real>
      <real index="2">latitude</real>
      <real index="4">longitude</real>
    </generic>
  </generics>
</das>
"""


class TestLegacyDasGrammar:
    """The manual's complete 'Basic usage example' (docs/DAS Core
    manual.md:2340-2392) through the legacy sectioned grammar."""

    def test_sections_parse_and_chain(self):
        from dcafs_spark.plans.xmlconfig import load_das_sections

        cfg = load_das_sections(MANUAL_DAS_XML)
        assert set(cfg["paths"]) == {"zda", "gga"}
        zda = cfg["paths"]["zda"]
        assert zda["src"] == "raw:id:gps"
        assert [s["type"] for s in zda["steps"]] == ["filter", "editor", "generic"]
        gga = cfg["paths"]["gga"]
        assert [s["type"] for s in gga["steps"]] == ["filter", "math", "generic"]
        assert gga["db"] == {"dbid": "navdata", "table": "gps"}
        assert cfg["streams"]["gps"]["address"] == "192.168.17.203:2101"
        assert cfg["databases"]["navdata"]["tables"]["gps"][0] == ("timestamp", "text")

    def test_gga_math_end_to_end(self, spark):
        from dcafs_spark.plans.dsl import compile_path
        from dcafs_spark.plans.xmlconfig import load_das_sections

        cfg = load_das_sections(MANUAL_DAS_XML)
        lines = spark.createDataFrame(
            [
                ("$GPGGA,191336.00,5113.583281,N,00256.13935,E,4,16,0.6,8.25,M,47.15,M,1.0,2382*74",),
                ("$GPZDA,191336.00,10,03,2021,,*6A",),  # filtered out
            ],
            "value string",
        )
        out, _rejects = compile_path(lines, cfg["paths"]["gga"])
        out = out.collect()
        assert len(out) == 1
        row = out[0]
        assert row["fixtime"] == 191336.00
        assert row["latitude"] == pytest.approx(51.22638801666667, abs=1e-9)
        assert row["longitude"] == pytest.approx(2.9356558333333335, abs=1e-9)

    def test_zda_editor_end_to_end(self, spark):
        from dcafs_spark.plans.dsl import compile_path
        from dcafs_spark.plans.xmlconfig import load_das_sections

        cfg = load_das_sections(MANUAL_DAS_XML)
        lines = spark.createDataFrame([("$GPZDA,191336.00,10,03,2021,,*6A",)], "value string")
        out, _rejects = compile_path(lines, cfg["paths"]["zda"])
        out = out.collect()
        assert len(out) == 1
        # manual: -> $GPZDA,2021-03-10 19:13:36.000,,*6A ; generic takes i1
        assert out[0]["timestamp"] == "2021-03-10 19:13:36.000"


def test_engine_pf_load_detects_legacy_layout(spark):
    from dcafs_spark.engine import Engine

    eng = Engine(spark)
    reply = eng.command("pf:load," + MANUAL_DAS_XML)
    assert "loaded 2 path(s): gga, zda" in reply
    assert "1 stream(s), 1 db(s)" in reply
    assert eng.sources["gps"]["kind"] == "socket"
    assert eng.sources["gps"]["port"] == 2101
    assert eng.dbs["navdata"]["dialect"] == "sqlite"
    assert "gps" in eng.dbs["navdata"]["tables"]
    assert set(eng.paths) == {"gga", "zda"}


RTVALS_XML = """
<das>
  <settings>
    <rtvals>
      <group id="ctd">
        <real name="temp" unit="C" default="7.5" options="minmax,history:5,scale:2">
          <cmd when="above 20">issue:add,hot,Temp $ above limit</cmd>
        </real>
        <real name="sal" unit="psu"/>
        <flag name="pump" default="true"/>
        <text name="mode" default="idle"/>
      </group>
    </rtvals>
  </settings>
</das>
"""


class TestRtvalsXml:
    def test_parse(self):
        from dcafs_spark.plans.xmlconfig import load_rtvals

        vals = load_rtvals(RTVALS_XML)
        by = {(v["group"], v["name"]): v for v in vals}
        t = by[("ctd", "temp")]
        assert t["unit"] == "C" and t["default"] == "7.5"
        assert t["options"] == {"minmax": True, "history": "5", "scale": "2"}
        assert t["cmds"] == [("above 20", "issue:add,hot,Temp $ above limit")]
        assert by[("ctd", "pump")]["vtype"] == "flag"

    def test_engine_registers_defaults_and_triggers(self, spark):
        from dcafs_spark.engine import Engine

        eng = Engine(spark)
        reply = eng.command("pf:load," + RTVALS_XML)
        assert "4 rtval(s)" in reply
        assert eng.store.get("ctd", "temp") == 7.5
        assert eng.store.get_flag("ctd", "pump") is True
        assert eng.store.get_text("ctd", "mode") == "idle"
        assert eng.val_meta[("ctd", "temp")]["unit"] == "C"
        # drive the trigger over the limit: the fired command renders $
        batch = spark.createDataFrame(
            [("ctd", "temp", 23.0, 1)], "group string, name string, value double, ts long"
        )
        eng.store.merge_batch(batch)
        assert eng.store.fired_log, "trigger did not fire"
        assert "hot" in eng.command("issue:list")
        # unit renders in the rtvals listing (reference shows 7.5C)
        assert "ctd -> temp : 23C" in eng.command("rtvals")
