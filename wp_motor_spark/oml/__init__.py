from wp_motor_spark.oml import functions
