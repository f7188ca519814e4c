from ureplicator_spark.plans.inspect import (  # noqa: F401
    assert_broadcast_join,
    assert_max_shuffles,
    assert_pushed_filters,
    broadcast_hinted_tables,
    count_broadcast_joins,
    count_shuffles,
    plan_string,
    read_schemas,
)
