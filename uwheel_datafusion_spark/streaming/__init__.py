from uwheel_datafusion_spark.streaming.wheel_stream import StreamingWheel

__all__ = ["StreamingWheel"]
