"""Scale-critical physical operator helpers: skew mitigation, co-located
(bucketed) joins.  The relational surface itself is plain DataFrame ops in
``queries/``; this package holds the strategies that keep those ops fast
when the data is 1000x bigger or pathologically skewed.
"""
