PREFIX : <http://example/>
INSERT { ?s :maybe ?x . ?s :seen true }
WHERE { ?s :p ?o OPTIONAL { ?s :extra ?x } }
