"""Physical-plan inspection (SURVEY.md §4.2): the optimizer work is
Catalyst's; this package makes its effects ASSERTABLE — pushed filters,
pruned scan schemas, broadcast joins, codegen coverage — so performance
properties are pinned by tests, not hoped for."""

from big_data_analysis_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    formatted_plan,
    has_wholestage_codegen,
    scan_infos,
)
