"""Round-trip queries through the strawboat columnar format —
filled in once sources/ lands.
"""
