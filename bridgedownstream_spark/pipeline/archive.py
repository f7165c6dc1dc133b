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
    archive_root: str, dataset: str, keep_last: int
) -> list[str]:
    """Retention for the archive store: delete all but the newest
    ``keep_last`` archived updates of ``dataset``. Returns the removed
    directory names (sorted).

    An archived "update" is the SET of table directories sharing one
    update number (root + children archived together by
    :func:`archive_dataset`); retention operates on whole updates, never
    on individual tables, so a kept update always restores consistently.
    Matching uses the same ``{dataset}[_child]_{n}`` pattern as
    :func:`next_update_number` — consistent with what
    :func:`archive_dataset` wrote. A sibling whose name extends
    ``dataset`` WITHOUT an underscore (``ds_v1`` vs ``ds_v1b``) can never
    match; one that extends it WITH an underscore (``gait`` vs
    ``gait_v2``) is textually indistinguishable from a child table of the
    shorter name (``gait_v2_3`` = child ``v2`` update 3 OR dataset
    ``gait_v2`` update 3) — the same ambiguity ``sync_batch_to_lake``
    raises on. Deployments with such names must give each dataset family
    its own ``archive_root``.
    """
    if keep_last < 1:
        raise ValueError(f"prune_archives: keep_last must be >= 1, got {keep_last}")
    if not os.path.isdir(archive_root):
        return []
    pat = re.compile(re.escape(dataset) + r"(?:_.+)?_(\d+)$")
    by_update: dict[int, list[str]] = {}
    for name in os.listdir(archive_root):
        if m := pat.match(name):
            by_update.setdefault(int(m.group(1)), []).append(name)
    removed: list[str] = []
    for n in sorted(by_update)[: max(0, len(by_update) - keep_last)]:
        for name in by_update[n]:
            shutil.rmtree(os.path.join(archive_root, name))
            removed.append(name)
    return sorted(removed)
