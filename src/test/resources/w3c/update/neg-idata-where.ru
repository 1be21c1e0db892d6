PREFIX : <http://example/>
INSERT DATA { :s :p 1 } WHERE { ?s ?p ?o }
