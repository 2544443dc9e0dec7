// tokdump — live-differential harness: tokenize stdin through the
// REAL ISphTokenizer (UTF-8 or n-gram variant) and print one token
// per line.  Built by scripts/build_reference.sh next to confdump;
// driven by tests/test_ref_differential.py's tokenizer fuzz.
//
//   tokdump <charset_table|-> [min_word_len] [ngram_chars|-]
//
// '-' means "leave the setting at its default" (the built-in charset
// table / the plain UTF-8 tokenizer).
#include "sphinx.h"
#include "sphinxutils.h"
#include <stdio.h>
#include <string.h>
#include <stdlib.h>

int main ( int argc, char ** argv )
{
	CSphString sError;
	CSphTokenizerSettings tSettings;
	tSettings.m_iType = TOKENIZER_UTF8;
	if ( argc>1 && strcmp ( argv[1], "-" ) )
		tSettings.m_sCaseFolding = argv[1];
	if ( argc>2 )
		tSettings.m_iMinWordLen = atoi ( argv[2] );
	if ( argc>3 && strcmp ( argv[3], "-" ) )
	{
		tSettings.m_iType = TOKENIZER_NGRAM;
		tSettings.m_sNgramChars = argv[3];
		tSettings.m_iNgramLen = 1;
	}

	ISphTokenizer * pTok = ISphTokenizer::Create ( tSettings, sError );
	if ( !pTok )
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

	pTok->SetBuffer ( &dBuf[0], strlen ( (const char*)&dBuf[0] ) );
	BYTE * sTok;
	while ( ( sTok = pTok->GetToken() ) != NULL )
		printf ( "%s\n", sTok );

	SafeDelete ( pTok );
	return 0;
}
