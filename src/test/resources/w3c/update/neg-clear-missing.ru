CLEAR GRAPH <http://example/no-such-graph>
