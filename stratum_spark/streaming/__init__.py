from stratum_spark.streaming.driver import start_stream, run_stream_until_idle

__all__ = ["start_stream", "run_stream_until_idle"]
