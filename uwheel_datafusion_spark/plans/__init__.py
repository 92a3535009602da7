from uwheel_datafusion_spark.plans.range_plan import (
    RangePlan,
    SlotRun,
    decompose_range,
    explain_range,
)

__all__ = ["RangePlan", "SlotRun", "decompose_range", "explain_range"]
