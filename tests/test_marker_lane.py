"""Keeps the `spark` auto-marker (conftest.pytest_collection_modifyitems)
exact: it marks tests by `spark`-fixture usage, which equals JVM usage only
while no test module builds its own SparkSession. If this fails, either
route the new test through the fixture or extend the marker hook."""

import pathlib

TESTS = pathlib.Path(__file__).parent


def test_no_jvm_lane_is_exact():
    offenders = []
    for f in sorted(TESTS.glob("test_*.py")):
        if f.name == "test_marker_lane.py":
            continue
        src = f.read_text()
        if "getOrCreate" in src or "SparkSession.builder" in src:
            offenders.append(f.name)
    assert offenders == [], (
        f"{offenders} build a SparkSession outside the conftest fixture — "
        "the `-m 'not spark'` no-JVM lane would silently start a JVM"
    )
