from dcafs_spark.plans.dsl import PathSpec, compile_path, compile_steps

__all__ = ["PathSpec", "compile_path", "compile_steps"]
