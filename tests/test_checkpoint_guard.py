"""Permanent guard: every localCheckpoint in the engine must be eager.

Round-9 documented (and rounds 9 + 10 both reproduced live, jstack
``Found 1 Java-level deadlock``) the lock inversion that fires when a
LAZY ``localCheckpoint(eager=False)`` frame is first materialized by a
``broadcast-exchange`` thread while the ``dag-scheduler-event-loop``
holds the RDD monitor: ``RDD.markCheckpointed`` vs
``RDDCheckpointData.checkpoint`` acquire the two locks in opposite
orders.  The race is timing-dependent — it passes most runs and hangs
the JVM on the unlucky one, which at 100 TB means a cluster job frozen
at hour 20.

The round-11 repo rule (VERDICT r10 task #1): eagerness is free because
every checkpointed frame in this engine is consumed unconditionally, so
NO call site may pass ``eager=False``.  A site may only be exempted by
listing it in ``_LAZY_ALLOWLIST`` below with a comment proving no
broadcast (direct or derived) can ever materialize it — the allowlist
is intentionally empty.

This is a static source walk (AST, not grep) so string literals and
comments cannot false-positive, and it covers every ``.py`` file in the
package — new operators are guarded automatically.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "mongo_cdc_spark"

# (relative_path, lineno) pairs; every entry MUST carry a written proof
# that no broadcast can derive from the lazy frame. Empty by design.
_LAZY_ALLOWLIST: frozenset[tuple[str, int]] = frozenset()


def _lazy_checkpoint_sites(path: pathlib.Path):
    tree = ast.parse(path.read_text(), filename=str(path))
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        fn = node.func
        if not (isinstance(fn, ast.Attribute)
                and fn.attr in ("localCheckpoint", "checkpoint")):
            continue
        for kw in node.keywords:
            if kw.arg == "eager" and isinstance(kw.value, ast.Constant) \
                    and kw.value.value is False:
                yield node.lineno


def test_no_lazy_checkpoints_anywhere():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG.parent))
        for lineno in _lazy_checkpoint_sites(path):
            if (rel, lineno) not in _LAZY_ALLOWLIST:
                offenders.append(f"{rel}:{lineno}")
    assert not offenders, (
        "localCheckpoint(eager=False) is banned (broadcast-thread "
        "deadlock class, VERDICT r10 task #1); make these eager or "
        "add a proven allowlist entry: " + ", ".join(offenders))


def test_allowlist_entries_still_exist():
    """A stale allowlist entry (file moved / line drifted) would
    silently re-open the hole for a NEW lazy site at that line."""
    for rel, lineno in _LAZY_ALLOWLIST:
        path = PKG.parent / rel
        assert path.exists(), f"allowlisted file vanished: {rel}"
        assert lineno in set(_lazy_checkpoint_sites(path)), (
            f"allowlist entry {rel}:{lineno} no longer matches a lazy "
            "checkpoint site — remove or re-prove it")
