from .inspect import explain_str, physical_ops, count_exchanges, pushed_filters

__all__ = ["explain_str", "physical_ops", "count_exchanges", "pushed_filters"]
