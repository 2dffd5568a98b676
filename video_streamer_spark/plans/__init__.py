"""Physical-plan introspection: assertions about pushdown, broadcast,
and shuffle counts that keep the 100 TB properties from regressing.
"""

from video_streamer_spark.plans.explain import plan_report, PlanReport

__all__ = ["plan_report", "PlanReport"]
