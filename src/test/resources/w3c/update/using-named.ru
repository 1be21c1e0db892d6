PREFIX : <http://example/>
INSERT { ?s :found ?o }
USING NAMED <http://example/g1>
WHERE { GRAPH ?g { ?s :in ?o } }
