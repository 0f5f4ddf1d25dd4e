"""Export settings — field-for-field mirror of the reference's
ExportConfigurationSettings (app/schemas/configuration.py:6-14; defaults
also server-side in app/models/configuration.py:25-38)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ExportSettings:
    include_labels: bool = True
    remove_group_name: bool = True
    do_not_split_select_multiple: bool = False
    include_reviews: bool = False
    include_labels_only: bool = True
    value_select_multiples: bool = True
    binary_select_multiples: bool = True
    show_choice_labels: bool = True
