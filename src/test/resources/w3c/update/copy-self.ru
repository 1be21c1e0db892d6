COPY GRAPH <http://example/g1> TO GRAPH <http://example/g1>
