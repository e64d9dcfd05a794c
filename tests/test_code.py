"""Code-corpus screening lane (E285-E286): shape/comment stats and
license detection on hand-built snippets with known-by-hand answers."""

import pytest

from sparkplug_spark.operators import code_stats, detect_license

SNIPPET = (
    "# header comment\n"
    "def f(x):\n"
    "    return x + 1\n"
    "\ty = f(2)\n"
    "// trailing note\n"
    "data"
)


class TestCodeStats:
    def test_hand_counted_snippet(self, spark):
        df = spark.createDataFrame(
            [(1, SNIPPET)], "doc_id long, text string"
        )
        (r,) = code_stats(df).collect()
        assert r["n_lines"] == 6
        assert r["n_comment_lines"] == 2  # '# header', '// trailing'
        assert r["comment_ppm"] == 2 * 10**6 // 6
        assert r["max_line_len"] == len("    return x + 1")
        total_chars = len(SNIPPET) - 5  # minus the 5 newlines
        assert r["mean_line_len_milli"] == total_chars * 1000 // 6
        assert r["tab_indent_lines"] == 1
        assert r["space_indent_lines"] == 1
        # identifiers: header,comment,def,f,x,return,x,y,f,trailing,note,data
        assert r["n_identifiers"] == 12

    def test_null_and_empty_text(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, "")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in code_stats(df).collect()}
        for d in (1, 2):
            assert rows[d]["n_lines"] == 1  # split('') -> ['']
            assert rows[d]["n_comment_lines"] == 0
            assert rows[d]["max_line_len"] == 0
            assert rows[d]["alpha_ppm"] == 0

    def test_block_comment_star_lines(self, spark):
        txt = "/* open\n * body\n */ tail\nreal code"
        df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
        (r,) = code_stats(df).collect()
        assert r["n_comment_lines"] == 3


class TestDetectLicense:
    CASES = [
        (1, "# SPDX-License-Identifier: Apache-2.0\ncode", "Apache-2.0",
         None, "Apache-2.0"),
        (2, "Permission is hereby granted, free of charge\ncode", None,
         "MIT", "MIT"),
        (3, "x = 1", None, None, None),
        # SPDX is authoritative even when a phrase also matches
        (4, "# SPDX-License-Identifier: MIT\n"
            "licensed under the apache license", "MIT", "Apache-2.0",
         "MIT"),
        # phrase outside the 400-char header window does not fire
        (5, "x" * 500 + " permission is hereby granted", None, None, None),
    ]

    def test_cases(self, spark):
        df = spark.createDataFrame(
            [(d, t) for d, t, *_ in self.CASES],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in detect_license(df).collect()}
        for d, _, spdx, guess, lic in self.CASES:
            assert got[d]["spdx_tag"] == spdx, d
            assert got[d]["license_guess"] == guess, d
            assert got[d]["license"] == lic, d

    def test_precedence_first_phrase_wins(self, spark):
        txt = (
            "permission is hereby granted under the apache license"
        )
        df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
        (r,) = detect_license(df).collect()
        assert r["license_guess"] == "MIT"


class TestPackRepoContext:
    def test_greedy_fold_and_headers(self, spark):
        from sparkplug_spark.operators import pack_repo_context

        rows = [
            ("r1", "a.py", "one two three"),        # 3 tokens
            ("r1", "b.py", "four five"),            # 2 -> fits (5 <= 5)
            ("r1", "c.py", "six seven eight"),      # 3 -> new block
            ("r1", "d.py", " ".join(["t"] * 9)),    # 9 > 5: own block
            ("r2", "z.py", "only file"),
        ]
        df = spark.createDataFrame(rows, "repo string, path string, text string")
        out = {
            (r["repo"], r["block_idx"]): r
            for r in pack_repo_context(df, block_tokens=5).collect()
        }
        b0 = out[("r1", 0)]
        assert b0["n_files"] == 2 and b0["n_block_tokens"] == 5
        assert b0["text"] == (
            "<<<FILE: a.py>>>\none two three\n<<<FILE: b.py>>>\nfour five"
        )
        assert out[("r1", 1)]["n_files"] == 1
        assert out[("r1", 2)]["n_block_tokens"] == 9  # over-budget file
        assert out[("r2", 0)]["n_files"] == 1
        assert len(out) == 4

    def test_path_order_not_input_order(self, spark):
        from sparkplug_spark.operators import pack_repo_context

        df = spark.createDataFrame(
            [("r", "z.py", "zz"), ("r", "a.py", "aa")],
            "repo string, path string, text string",
        )
        (b,) = pack_repo_context(df, block_tokens=100).collect()
        assert b["text"].index("a.py") < b["text"].index("z.py")
