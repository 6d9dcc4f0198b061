from wp_motor_spark.sinks.formats import format_lines
from wp_motor_spark.sinks.spec import SinkSpec

__all__ = ["SinkSpec", "format_lines"]
