from graph_data_science_spark.plans.checkpoint import SuperstepCheckpointer

__all__ = ["SuperstepCheckpointer"]
