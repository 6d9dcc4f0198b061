from wp_motor_spark.wpl.ast import WplField, WplGroup, WplRule
from wp_motor_spark.wpl.parser import parse_wpl
from wp_motor_spark.wpl.compiler import compile_rule, CompiledRule, MultiParser
