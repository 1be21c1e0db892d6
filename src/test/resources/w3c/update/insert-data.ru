PREFIX : <http://example/>
INSERT DATA { :c :p 3 . :a :p 1 . }
