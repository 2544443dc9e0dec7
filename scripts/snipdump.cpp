// snipdump — live-differential harness: build an excerpt from stdin
// source text through the REAL sphBuildExcerpt (default UTF-8
// tokenizer + CRC dict).  Built by scripts/build_reference.sh; driven
// by the excerpts fuzz in tests/test_ref_differential.py.
//
//   snipdump <words> <before> <after> <sep> <limit> <around> <flags>
//
// flags: comma-joined subset of exact,single,weight,spaces,none
#include "sphinx.h"
#include "sphinxexcerpt.h"
#include "sphinxutils.h"
#include <stdio.h>
#include <string.h>
#include <stdlib.h>

int main ( int argc, char ** argv )
{
	if ( argc < 8 )
	{
		printf ( "usage: snipdump words before after sep limit around flags\n" );
		return 2;
	}
	CSphString sError;
	CSphTokenizerSettings tTokSettings;
	tTokSettings.m_iType = TOKENIZER_UTF8;
	ISphTokenizer * pTok = ISphTokenizer::Create ( tTokSettings, sError );
	if ( !pTok ) { printf ( "ERROR: %s\n", sError.cstr() ); return 1; }
	CSphDictSettings tDictSettings;
	CSphDict * pDict = sphCreateDictionaryCRC ( tDictSettings, pTok, sError );
	if ( !pDict ) { printf ( "ERROR: %s\n", sError.cstr() ); return 1; }

	ExcerptQuery_t q;
	q.m_sWords = argv[1];
	q.m_sBeforeMatch = argv[2];
	q.m_sAfterMatch = argv[3];
	q.m_sChunkSeparator = argv[4];
	q.m_iLimit = atoi ( argv[5] );
	q.m_iAround = atoi ( argv[6] );
	q.m_bExactPhrase = strstr ( argv[7], "exact" )!=NULL;
	q.m_bSinglePassage = strstr ( argv[7], "single" )!=NULL;
	q.m_bWeightOrder = strstr ( argv[7], "weight" )!=NULL;
	q.m_bRemoveSpaces = strstr ( argv[7], "spaces" )!=NULL;

	CSphVector<char> dBuf;
	char sChunk [ 65536 ];
	int iRead;
	while ( ( iRead = fread ( sChunk, 1, sizeof(sChunk), stdin ) ) > 0 )
		for ( int i=0; i<iRead; i++ )
			dBuf.Add ( sChunk[i] );
	dBuf.Add ( '\0' );
	q.m_sSource = &dBuf[0];

	char * sRes = sphBuildExcerpt ( q, pDict, pTok );
	if ( !sRes ) { printf ( "ERROR: excerpt failed\n" ); return 1; }
	fputs ( sRes, stdout );
	return 0;
}
