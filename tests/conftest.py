import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder
         .master("local[4]")
         .appName("filtlong_spark_tests")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                 "true")
         .config("spark.sql.autoBroadcastJoinThreshold", "64m")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "4g")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


# deep property-test profile: HYPOTHESIS_PROFILE=deep python -m pytest ...
try:
    from hypothesis import HealthCheck, settings as _hyp_settings
    _hyp_settings.register_profile(
        "deep", max_examples=3000, deadline=None,
        suppress_health_check=list(HealthCheck))
    import os as _os
    if _os.environ.get("HYPOTHESIS_PROFILE"):
        _hyp_settings.load_profile(_os.environ["HYPOTHESIS_PROFILE"])
except ImportError:
    pass
