from tenzir_spark.plans.expr import compile_expr, parse_expr

__all__ = ["compile_expr", "parse_expr"]
