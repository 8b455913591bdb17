from dcafs_spark.sources.replay import read_lines, replay_files

__all__ = ["read_lines", "replay_files"]
