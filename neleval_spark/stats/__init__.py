from .significance import (  # noqa: F401
    nist_percentile,
    per_doc_contingency,
    permutation_test,
    bootstrap_confidence,
    calibrate_trials,
)
