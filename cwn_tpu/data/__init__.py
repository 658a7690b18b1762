"""Dataset layer: plain-graph records, lifted-complex datasets, loaders."""

from cwn_tpu.data.graph import Graph
