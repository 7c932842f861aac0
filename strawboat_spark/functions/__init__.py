"""Column-level function libraries (pure expressions — JVM-side,
whole-stage-codegen friendly; no Python UDFs in these hot paths).
"""
