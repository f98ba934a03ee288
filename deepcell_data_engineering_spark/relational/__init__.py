from deepcell_data_engineering_spark.relational.queries import QUERIES, QuerySpec  # noqa: F401

# registering imports: each module adds its QuerySpecs to QUERIES
import deepcell_data_engineering_spark.relational.pipeline_queries  # noqa: F401,E402
