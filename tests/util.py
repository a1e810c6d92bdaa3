"""Test helpers mirroring the reference's tests/util.check_correct."""


def check_correct(expected: dict, actual: dict, tol: float = 1e-9):
    """Every expected (measure, metric) must be present and equal in
    actual (reference: neleval/tests/util.py)."""
    for measure, exp in expected.items():
        assert measure in actual, f"missing measure {measure}"
        got = actual[measure]
        for metric, val in exp.items():
            gv = got[metric]
            assert abs(gv - val) < tol, (
                f"{measure}.{metric}: expected {val}, got {gv}")
    return True
