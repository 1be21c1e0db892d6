PREFIX : <http://example/>
INSERT { GRAPH ?g { :mark :seen true } }
WHERE { GRAPH ?g { ?s :in ?o } }
