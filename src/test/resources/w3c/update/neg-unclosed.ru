PREFIX : <http://example/>
INSERT DATA { :s :p 1
