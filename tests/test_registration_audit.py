"""The registration-audit gate must catch every entry-surgery failure
shape that has actually shipped (r11 stacked decorator; r12
page_trend orphan+steal), plus the steering-list typo class."""

import subprocess
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from registration_audit import audit  # noqa: E402

HEADER = """
_QUERIES = {}
_ORACLES = {}


def _q(name, sql=None):
    def register(fn):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn
    return register
"""


def _audit_src(tmp_path, src):
    p = tmp_path / "entry.py"
    p.write_text(HEADER + src)
    return audit(str(p))


def test_clean_file_passes(tmp_path):
    assert _audit_src(tmp_path, """
@_q("alpha", "SELECT 1")
def q_alpha(spark, sf):
    return None


_q("flagship", "SELECT 2")(q_alpha)
""") == []


def test_stacked_decorators_flagged(tmp_path):
    # the page_trend shape: an insert lands between Page's decorator
    # and its def, stacking Page's registration onto the new function
    findings = _audit_src(tmp_path, """
@_q("page_trend", "SELECT 1")
@_q("cronbach", "SELECT 2")
def q_cronbach(spark, sf):
    return None
""")
    assert any("stacked" in f for f in findings)


def test_orphaned_q_function_flagged(tmp_path):
    # the other half: the original q_ function left with no decorator
    findings = _audit_src(tmp_path, """
def q_page_trend(spark, sf):
    return None
""")
    assert any("orphaned" in f or "no @_q" in f for f in findings)


def test_duplicate_name_flagged(tmp_path):
    findings = _audit_src(tmp_path, """
@_q("alpha", "SELECT 1")
def q_alpha(spark, sf):
    return None


@_q("alpha", "SELECT 2")
def q_alpha2(spark, sf):
    return None
""")
    assert any("duplicate" in f for f in findings)


def test_steering_list_typo_flagged(tmp_path):
    findings = _audit_src(tmp_path, """
@_q("alpha", "SELECT 1")
def q_alpha(spark, sf):
    return None


_DRIVER_PRIORITY = ["alpha", "no_such_query"]
""")
    assert any("no_such_query" in f for f in findings)


def test_non_literal_name_flagged(tmp_path):
    findings = _audit_src(tmp_path, """
NAME = "alpha"


@_q(NAME, "SELECT 1")
def q_alpha(spark, sf):
    return None
""")
    assert any("not a string literal" in f for f in findings)


def test_real_entry_file_clean():
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "registration_audit.py")],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "CLEAN" in out.stdout
