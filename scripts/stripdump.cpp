// stripdump — live-differential harness: strip stdin HTML through the
// REAL CSphHTMLStripper and print the result.  Built by
// scripts/build_reference.sh; driven by the stripper fuzz in
// tests/test_ref_differential.py.
//
//   stripdump <html_index_attrs|-> <html_remove_elements|->
#include "sphinx.h"
#include <stdio.h>
#include <string.h>

int main ( int argc, char ** argv )
{
	CSphString sError;
	CSphHTMLStripper tStripper;
	if ( argc>1 && strcmp ( argv[1], "-" ) )
		if ( !tStripper.SetIndexedAttrs ( argv[1], sError ) )
		{
			printf ( "ERROR: %s\n", sError.cstr() );
			return 1;
		}
	if ( argc>2 && strcmp ( argv[2], "-" ) )
		if ( !tStripper.SetRemovedElements ( argv[2], sError ) )
		{
			printf ( "ERROR: %s\n", sError.cstr() );
			return 1;
		}

	CSphVector<BYTE> dBuf;
	char sChunk [ 65536 ];
	int iRead;
	while ( ( iRead = fread ( sChunk, 1, sizeof(sChunk), stdin ) ) > 0 )
		for ( int i=0; i<iRead; i++ )
			dBuf.Add ( (BYTE)sChunk[i] );
	dBuf.Add ( '\0' );

	tStripper.Strip ( &dBuf[0] );
	fputs ( (const char*)&dBuf[0], stdout );
	return 0;
}
