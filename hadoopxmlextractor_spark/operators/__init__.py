from hadoopxmlextractor_spark.operators.assembly import assemble_rows

__all__ = ["assemble_rows"]
