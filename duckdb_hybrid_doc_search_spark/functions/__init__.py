"""Expression builders shared by operators.

Each module exposes paired builders: a PySpark Column expression and the
equivalent DuckDB SQL fragment (prefixed ``dd_``), so every computation the
correctness gate hashes is defined in exactly one place per engine, side by
side.
"""
