from big_ann_spark.plans.inspect import executed_plan, formatted_plan  # noqa: F401
