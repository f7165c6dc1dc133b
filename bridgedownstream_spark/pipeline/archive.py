"""Dataset archiving: the schema-change protocol's "archive the old
parquet" step.

Reference semantics (src/scripts/archive_dataset/archive_dataset.py:60-160):
every descendant table of a dataset version (root + its ``_``-suffixed
child tables) is copied under ``archive/`` with a monotonically increasing
update number — ``{table}_{n+1}`` where ``n`` is the highest number already
archived for that dataset version. Together with
:func:`~bridgedownstream_spark.pipeline.registry.is_compatible_evolution`
and :meth:`~bridgedownstream_spark.pipeline.ledger.FileLedger.reset`, this
completes the protocol loop for a *compatible* change: archive → update
declared schema → reset bookmark → rebuild
(docs/schema_change_protocol.md §3).

Local-filesystem implementation: directory copies. On object storage the
same function maps to a distributed copy; the naming/number logic — the
actual semantics — is storage-agnostic.
"""

from __future__ import annotations

import os
import re
import shutil

__all__ = [
    "archive_dataset",
    "next_update_number",
    "descendant_tables",
    "prune_archives",
]


def descendant_tables(parquet_root: str, dataset: str) -> list[str]:
    """The dataset's table directories: the root table and every child
    (``{dataset}`` and ``{dataset}_…``, per the relationalize naming
    contract)."""
    if not os.path.isdir(parquet_root):
        return []
    return sorted(
        name
        for name in os.listdir(parquet_root)
        if name == dataset or name.startswith(f"{dataset}_")
    )


def next_update_number(archive_root: str, dataset: str) -> int:
    """One more than the highest archived update number for this dataset
    (reference get_archive_dataset_update_number: 0 when none exist)."""
    if not os.path.isdir(archive_root):
        return 1
    pat = re.compile(re.escape(dataset) + r"(?:_.+)?_(\d+)$")
    nums = [
        int(m.group(1))
        for name in os.listdir(archive_root)
        if (m := pat.match(name))
    ]
    return (max(nums) + 1) if nums else 1


def archive_dataset(
    parquet_root: str, dataset: str, archive_root: str | None = None
) -> dict[str, str]:
    """Copy every descendant table of ``dataset`` into the archive under
    ``{table}_{update}``. Returns ``{source_path: archive_path}``."""
    if archive_root is None:
        archive_root = os.path.join(parquet_root, "archive")
    update = next_update_number(archive_root, dataset)
    moved: dict[str, str] = {}
    for table in descendant_tables(parquet_root, dataset):
        src = os.path.join(parquet_root, table)
        dst = os.path.join(archive_root, f"{table}_{update}")
        shutil.copytree(src, dst)
        moved[src] = dst
    return moved


def prune_archives(
    archive_root: str,
    dataset: str,
    keep_last: int,
    tables: list[str] | None = None,
) -> list[str]:
    """Retention for the archive store: delete all but the newest
    ``keep_last`` archived updates of ``dataset``. Returns the removed
    directory names (sorted).

    An archived "update" is the SET of table directories sharing one
    update number (root + children archived together by
    :func:`archive_dataset`); retention operates on whole updates, never
    on individual tables, so a kept update always restores consistently.

    Deletion is irreversible, so matching is EXACT, never wildcard:

    - With ``tables`` (the dataset's table names — pass
      :func:`descendant_tables` output or the registry's child list), a
      directory is deleted only if it is exactly ``{table}_{n}`` for a
      listed table. A sibling dataset whose name extends ``dataset`` with
      an underscore (``gait`` vs ``gait_v2``) can never match unless its
      name was explicitly listed.
    - Without ``tables``, a child-form name ``{dataset}_{x}_{n}`` is only
      accepted when its update number ``n`` also has the root directory
      ``{dataset}_{n}`` present (:func:`archive_dataset` always writes the
      root alongside the children); a child-form name with NO matching
      root update is the signature of a sibling dataset's archive
      (``gait_v2_3`` without ``gait_3``) and raises instead of deleting.
      This detects non-overlapping siblings only — deployments whose
      sibling update numbers fully overlap the dataset's must pass
      ``tables`` (or give each dataset family its own ``archive_root``).
    """
    if keep_last < 1:
        raise ValueError(f"prune_archives: keep_last must be >= 1, got {keep_last}")
    if not os.path.isdir(archive_root):
        return []
    if tables is not None:
        pats = [
            (re.compile(re.escape(t) + r"_(\d+)$"), t)
            for t in set(tables) | {dataset}
        ]
    else:
        pats = [(re.compile(re.escape(dataset) + r"(?:_.+)?_(\d+)$"), None)]
    by_update: dict[int, list[str]] = {}
    for name in os.listdir(archive_root):
        for pat, _t in pats:
            if m := pat.match(name):
                by_update.setdefault(int(m.group(1)), []).append(name)
                break
    if tables is None:
        orphans = [
            name
            for n, names in by_update.items()
            if f"{dataset}_{n}" not in names
            for name in names
        ]
        if orphans:
            # Two indistinguishable causes, so fail safe and name both:
            # a sibling dataset's archives, or debris of a previously
            # INTERRUPTED prune (root dir removed, children of the same
            # update left behind). Auto-deleting would be wrong for the
            # sibling case (an older sibling update looks identical to
            # debris), so recovery is explicit either way.
            raise ValueError(
                f"prune_archives: {sorted(orphans)} match dataset "
                f"{dataset!r}'s child pattern but have no corresponding "
                f"root update. Either (a) they belong to a SIBLING dataset "
                "(e.g. 'gait_v2_3' vs dataset 'gait') — pass tables= with "
                "the dataset's real table names to prune safely — or (b) "
                "they are leftovers of a prune interrupted mid-delete "
                "(root directory removed first) — verify and remove the "
                "orphan directories, or pass tables= including their table "
                "names so retention can reclaim them"
            )
    removed: list[str] = []
    for n in sorted(by_update)[: max(0, len(by_update) - keep_last)]:
        for name in by_update[n]:
            shutil.rmtree(os.path.join(archive_root, name))
            removed.append(name)
    return sorted(removed)
