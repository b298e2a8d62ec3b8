"""tools/scalesmoke.py env-policy plumbing (no Spark needed).

SMOKE_PRUNE feeds IngestPipeline.summary_prune, whose contract is
strictly {True, False, "auto"} (validated at construction since r13) —
a smoke run with a mistranslated policy would silently measure the
wrong configuration, so the mapping is pinned here.
"""

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)


def test_smoke_prune_policy_mapping(monkeypatch):
    from scalesmoke import smoke_prune_policy

    monkeypatch.delenv("SMOKE_PRUNE", raising=False)
    assert smoke_prune_policy() is True  # default: probes unconditional
    for raw, want in (("1", True), ("0", False), ("auto", "auto")):
        monkeypatch.setenv("SMOKE_PRUNE", raw)
        got = smoke_prune_policy()
        assert got == want and type(got) is type(want)
    # an unrecognized value maps to False (never a truthy hybrid — the
    # same failure mode validate_summary_prune guards in the pipeline)
    monkeypatch.setenv("SMOKE_PRUNE", "always")
    assert smoke_prune_policy() is False
