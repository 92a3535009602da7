from uwheel_datafusion_spark.operators.wheel import WheelIndex

__all__ = ["WheelIndex"]
