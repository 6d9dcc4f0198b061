from wp_motor_spark.operators import dedup, similarity, text, stats
