from vtshaver_spark.style.compile import style_to_filters
from vtshaver_spark.style.filters import Filters

__all__ = ["style_to_filters", "Filters"]
