from wp_motor_spark.model.types import SPARK_TYPE_FOR, spark_type_name
