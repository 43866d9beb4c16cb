"""Family query modules of the registry (split r13): importing
magiceye_spark.registry pulls these in for their @register side
effects — do not import them directly for queries; use
registry.queries()/oracles().
"""
