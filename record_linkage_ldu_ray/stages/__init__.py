"""Pipeline stages S1-S8 (SURVEY §3): each stage is a function taking and
returning a ``ray.data.Dataset`` — stateless ``map_batches`` transforms
except the scorer (actor pool) and the shuffles (groupby)."""
