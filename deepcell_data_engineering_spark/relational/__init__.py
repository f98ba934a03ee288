from deepcell_data_engineering_spark.relational.queries import QUERIES, QuerySpec  # noqa: F401
