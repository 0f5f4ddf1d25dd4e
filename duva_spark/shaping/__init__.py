"""XLSForm export-shaping operators.

The reference doesn't implement these — it *configures* them on OnaData
via export query params (ExportConfigurationSettings,
app/schemas/configuration.py:6-14, appended to the export URL at
app/core/onadata.py:152-157). A standalone engine must own them natively;
this package is that ownership: DataFrame→DataFrame operators
parameterized by an ExportSettings dataclass mirroring the reference's
schema, driven by form metadata (schema-first — the choice universe comes
from the form definition, never from scanning data, so output columns are
stable across syncs).
"""

from duva_spark.shaping.settings import ExportSettings
from duva_spark.shaping.ops import (
    apply_export_settings,
    flatten_group_names,
    join_reviews,
    rename_to_labels,
    split_select_multiple,
    unsplit_select_multiple,
)

__all__ = [
    "ExportSettings",
    "apply_export_settings",
    "flatten_group_names",
    "join_reviews",
    "rename_to_labels",
    "split_select_multiple",
    "unsplit_select_multiple",
]
