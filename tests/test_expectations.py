"""AcceptedValuesCheck / FormatCheck / cross-column conditional rules
(DESIGN.md:366-380 per-type value domains, SURVEY.md §2.10 extension)."""

import numpy as np
import pyarrow as pa

from driftray.checks import ValidationKernel
from driftray.fixtures import RepoFilesConfig, repo_files_batch
from driftray.spec import ColumnSpec, TableSpec, spec_from_dict


def counters_of(findings: pa.Table) -> dict:
    df = findings.to_pandas()
    c = df[df.kind == "counter"]
    return {(r.check, r.column): r.n for r in c.itertuples()}


def run(spec: TableSpec, t: pa.Table) -> dict:
    return counters_of(ValidationKernel(spec)(t))


class TestAcceptedValues:
    def test_counts_and_null_skip(self):
        spec = TableSpec(name="t", columns=[
            ColumnSpec("k", accepted_values=("a", "b"))])
        t = pa.table({"k": pa.array(["a", "b", "c", None, "B"], pa.string())})
        c = run(spec, t)
        assert c[("accepted", "k")] == 2        # 'c' and 'B' (case-sensitive)

    def test_zero_counter_always_present(self):
        spec = TableSpec(name="t", columns=[
            ColumnSpec("k", accepted_values=("a",))])
        c = run(spec, pa.table({"k": ["a", "a"]}))
        assert c[("accepted", "k")] == 0

    def test_conditional_rule_label_and_gate(self):
        # second entry for the same column, gated — labels must not merge
        spec = TableSpec(name="t", columns=[
            ColumnSpec("k", accepted_values=("a", "b", "x")),
            ColumnSpec("k", accepted_values=("a",), when=("g", "strict")),
        ])
        t = pa.table({"k": ["a", "x", "x"],
                      "g": ["strict", "strict", "lax"]})
        c = run(spec, t)
        assert c[("accepted", "k")] == 0
        assert c[("accepted", "k?g=strict")] == 1   # only the strict 'x'

    def test_violation_rows_emitted(self):
        spec = TableSpec(name="t", columns=[
            ColumnSpec("k", accepted_values=("a",))],
            order_column="k")
        f = ValidationKernel(spec)(pa.table({"k": ["a", "z"]})).to_pandas()
        v = f[(f.kind == "violation") & (f.check == "accepted")]
        assert len(v) == 1


class TestFormat:
    def test_full_match_anchoring(self):
        # pattern must match the WHOLE value — substring hits don't pass
        spec = TableSpec(name="t", columns=[
            ColumnSpec("s", pattern=r"src[0-9]")])
        t = pa.table({"s": ["src1", "src12", "xsrc1", None, ""]})
        c = run(spec, t)
        assert c[("format", "s")] == 3          # src12, xsrc1, "" fail; null skipped

    def test_regex_alternation_stays_anchored(self):
        # ^(?:a|b)$ — the non-capturing group keeps | inside the anchors
        spec = TableSpec(name="t", columns=[ColumnSpec("s", pattern=r"a|b")])
        c = run(spec, pa.table({"s": ["a", "b", "xa", "bx"]}))
        assert c[("format", "s")] == 2

    def test_conditional_format(self):
        spec = TableSpec(name="t", columns=[
            ColumnSpec("p", pattern=r".*\.py", when=("lang", "py"))])
        t = pa.table({"p": ["m.py", "m.js", "m.js"],
                      "lang": ["py", "py", "js"]})
        c = run(spec, t)
        assert c[("format", "p?lang=py")] == 1


class TestSpecFromDict:
    def test_accepted_and_pattern_parse(self):
        spec = spec_from_dict({
            "name": "t",
            "columns": [
                {"name": "k", "accepted": ["a", "b"]},
                {"name": "s", "pattern": "x+", "when": ["k", "a"]},
            ],
        })
        assert spec.accepted_columns[0].accepted_values == ("a", "b")
        assert spec.pattern_columns[0].pattern == "x+"
        assert spec.pattern_columns[0].when == ("k", "a")


class TestFixturePlanting:
    def test_planted_tags_match_data(self):
        cfg = RepoFilesConfig(p_bad_lang=0.05, p_bad_path_fmt=0.05,
                              p_null_path=0.0, p_dup_key=0.0)
        t = repo_files_batch(np.arange(4000), cfg)
        df = t.to_pandas()
        assert df["_bad_lang"].sum() > 0 and df["_bad_path_fmt"].sum() > 0
        # every tagged row really violates; untagged rows don't
        assert (df.loc[df._bad_lang, "lang"] == "xx").all()
        assert not df.loc[~df._bad_lang, "lang"].isin(["xx"]).any()
        assert df.loc[df._bad_path_fmt, "path"].str.contains(" ").all()

    def test_kernel_recovers_planted_counts(self):
        from driftray.spec import repo_files_spec
        cfg = RepoFilesConfig(p_bad_lang=0.05, p_bad_path_fmt=0.05,
                              p_null_path=0.0, p_dup_key=0.0)
        t = repo_files_batch(np.arange(4000), cfg)
        df = t.to_pandas()
        c = counters_of(ValidationKernel(repo_files_spec())(t))
        assert c[("accepted", "lang")] == int(df._bad_lang.sum())
        assert c[("format", "path")] == int(df._bad_path_fmt.sum())
        # cross rule: lang=py rows whose path isn't *.py (bad-fmt overlap)
        want = int((df.lang.eq("py") & ~df.path.fillna("").str.endswith(".py")).sum())
        assert c[("format", "path?lang=py")] == want
