"""Declared-schema dataset registry — the engine's replacement for the Glue
catalog plus crawlers.

The reference declares one fixed schema per JSON dataset version in
``src/glue/resources/table_columns.yaml`` (Glue column dicts with Hive DDL
type strings) and materializes them as catalog tables per study
(templates/study-pipeline-infra.j2:149-176); crawlers only discover
partitions, never change schemas (SchemaChangePolicy LOG,
study-pipeline-infra.j2:187-189). In Spark none of that machinery is needed:
``spark.read.schema(declared).json(path)`` with a ``basePath`` discovers
partitions natively, so the registry is just *the schemas*.

Registry document shape (YAML or dict — same shape as the reference's):

.. code-block:: yaml

    tables:
      dataset_v1:
        columns:
          - Name: recordid
            Type: string
          - Name: items
            Type: array<struct<name:string,value:double>>
        partition_keys:          # optional; defaults to the reference's four
          - Name: assessmentid
            Type: string
          ...

Partition keys are typed ``string`` at the catalog level even when the data
carries ints (reference table_columns.yaml:38-46 vs s3_to_json_s3.py:601-603
— the int-in-data / string-in-partition duality); we preserve that contract.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

__all__ = ["Dataset", "DatasetRegistry", "DEFAULT_PARTITION_KEYS"]

#: (name, catalog type) of the reference's universal partition keys
#: (reference: table_columns.yaml partition_keys on every table).
DEFAULT_PARTITION_KEYS: tuple[tuple[str, str], ...] = (
    ("assessmentid", "string"),
    ("year", "string"),
    ("month", "string"),
    ("day", "string"),
)


@dataclass(frozen=True)
class Dataset:
    """One declared dataset: column names/types + partition keys."""

    name: str
    columns: tuple[tuple[str, str], ...]  # (name, hive ddl type)
    partition_keys: tuple[tuple[str, str], ...] = DEFAULT_PARTITION_KEYS

    def data_schema(self) -> T.StructType:
        """Declared schema of the data files (partition keys excluded —
        they live in the directory layout, not the file bodies)."""
        return T.StructType(
            [
                T.StructField(n, T.DataType.fromDDL(t), nullable=True)
                for n, t in self.columns
            ]
        )

    def partition_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(n, T.DataType.fromDDL(t), nullable=True)
                for n, t in self.partition_keys
            ]
        )

    def full_schema(self) -> T.StructType:
        """Data columns followed by partition columns — the read schema for
        a partitioned JSON dataset (Spark resolves the partition-named
        fields from the directory layout, cast to the declared type)."""
        return T.StructType(
            list(self.data_schema().fields) + list(self.partition_schema().fields)
        )

    @property
    def partition_cols(self) -> list[str]:
        return [n for n, _ in self.partition_keys]


class DatasetRegistry:
    """Parse and serve dataset schemas from a YAML document, a path, or a
    plain dict of the same shape."""

    def __init__(self, doc: dict):
        tables = doc.get("tables", {})
        self._datasets: dict[str, Dataset] = {}
        for name, spec in tables.items():
            cols = tuple((c["Name"], c["Type"]) for c in spec.get("columns", []))
            pkeys = tuple(
                (c["Name"], c["Type"]) for c in spec.get("partition_keys", [])
            ) or DEFAULT_PARTITION_KEYS
            self._datasets[name] = Dataset(name, cols, pkeys)

    @classmethod
    def from_yaml(cls, text_or_path: str) -> "DatasetRegistry":
        import yaml

        if "\n" not in text_or_path and text_or_path.endswith((".yaml", ".yml")):
            with open(text_or_path) as f:
                return cls(yaml.safe_load(f))
        return cls(yaml.safe_load(text_or_path))

    def __contains__(self, name: str) -> bool:
        return name in self._datasets

    def __getitem__(self, name: str) -> Dataset:
        return self._datasets[name]

    def names(self) -> list[str]:
        return sorted(self._datasets)


def is_compatible_evolution(old: Dataset, new: Dataset) -> bool:
    """True when ``new`` is an *additive* evolution of ``old``: every old
    column survives with an identical declared type, and partition keys are
    unchanged. This is the reference's compatible/incompatible fork
    (docs/schema_change_protocol.md §1): compatible changes update the
    table in place (archive old parquet, reset bookmark, rebuild);
    incompatible ones — type changes, drops, renames — require a new
    ``_v{n+1}`` dataset."""
    old_cols = dict(old.columns)
    new_cols = dict(new.columns)
    if old.partition_keys != new.partition_keys:
        return False
    return all(name in new_cols and new_cols[name] == t for name, t in old_cols.items())
