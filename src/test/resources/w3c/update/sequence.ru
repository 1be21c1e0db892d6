PREFIX : <http://example/>
INSERT DATA { :c :p 3 } ;
DELETE WHERE { :a ?p ?o } ;
INSERT DATA { :d :p 4 }
