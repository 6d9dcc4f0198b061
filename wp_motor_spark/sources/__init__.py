from wp_motor_spark.sources.tables import load_table
