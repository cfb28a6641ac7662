"""Physical-plan inspection utilities."""

from oracle_vector_search_spark.plans.inspect import (  # noqa: F401
    assert_plan_contains,
    assert_plan_lacks,
    physical_plan,
)
