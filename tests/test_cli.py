"""CLI e2e: built-in apps + the user-plugin loading contract
(reference main/mrworker.go:37-54 loadPlugin, re-expressed as a .py
file defining Map/Reduce)."""

from __future__ import annotations

import collections

from mrgo_spark.__main__ import load_app, main
from mrgo_spark.sources import sinks

_USER_APP = '''
# A user-supplied MR "plugin": per-file vowel count.
import re

def Map(filename, contents):
    for m in re.finditer(r"[aeiou]", contents.lower()):
        yield m.group(0), "1"

def Reduce(key, values):
    return str(len(values))
'''


def _write_inputs(d):
    d.mkdir()
    (d / "pg-1.txt").write_text("the quick brown fox\n")
    (d / "pg-2.txt").write_text("jumps over the lazy dog\n")


def _read_output(spark, path):
    return {
        (r.key, r.value) for r in sinks.read_mr_text(spark, path).collect()
    }


def test_cli_sorted_concat_app(spark, tmp_path):
    """The sorted-concat built-in (crash.go's map/reduce without the
    crash): four metadata keys, values sorted and space-joined."""
    inp = tmp_path / "in"
    _write_inputs(inp)
    out = str(tmp_path / "out")
    assert main(["--app", "sorted-concat", "--input", str(inp),
                 "--output", out, "--n-reduce", "4"]) == 0
    got = dict(_read_output(spark, out))
    assert got["d"] == "xyzzy xyzzy"
    # a = sorted full file paths; both inputs present, sorted
    names = got["a"].split(" ")
    assert names == sorted(names) and len(names) == 2
    assert names[0].endswith("pg-1.txt") and names[1].endswith("pg-2.txt")
    # c = sorted contents lengths of the two files ("20 24")
    assert got["c"] == "20 24"


def test_cli_user_plugin_module(spark, tmp_path):
    """A Map/Reduce pair loaded from a user .py file runs end-to-end
    (the mrworker plugin contract): closures ship by value, so the
    file needs no presence on executor PYTHONPATH."""
    app = tmp_path / "vowels.py"
    app.write_text(_USER_APP)
    inp = tmp_path / "in"
    _write_inputs(inp)
    out = str(tmp_path / "out_plugin")
    assert main(["--app", str(app), "--input", str(inp),
                 "--output", out, "--n-reduce", "3"]) == 0
    got = dict(_read_output(spark, out))
    text = "the quick brown fox jumps over the lazy dog"
    want = collections.Counter(c for c in text if c in "aeiou")
    assert got == {k: str(n) for k, n in want.items()}


def test_load_app_rejects_bad_spec(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        load_app("not-an-app")
    empty = tmp_path / "empty.py"
    empty.write_text("x = 1\n")
    with pytest.raises(SystemExit):
        load_app(str(empty))
