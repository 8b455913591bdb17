from dcafs_spark.store.rtvals import current_values, history_window

__all__ = ["current_values", "history_window"]
