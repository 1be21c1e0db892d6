PREFIX : <http://example/>
DELETE DATA { GRAPH ?g { :a :p 1 } }
